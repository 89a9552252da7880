// Native basis store: the artifact cache's hot format.
//
// The reference torch.save()s three pickle files per basis
// (/root/reference/src/modules/edit.py:231-246); round 1 used one .npz
// (zip + deflate both ways). This is the mmap-friendly native replacement:
// a single binary file — 32-byte header + raw little-endian f32 segments
// (u, s, vT) — written through a temp file with fsync + atomic rename, so
// loads on the Python side are zero-copy np.memmap views and a crashed
// writer can never leave a torn basis behind. Harvest sweeps write hundreds
// of these back-to-back.

#include <cstdint>
#include <cstdio>

#include <fcntl.h>
#include <unistd.h>

namespace {

constexpr uint32_t kMagic = 0x53425044;  // "DPBS" little-endian
constexpr uint32_t kVersion = 1;

}  // namespace

extern "C" {

// header: 8 × u32 = magic, version, u_rows, u_cols, k, vT_rows, vT_cols, 0
int dpx_basis_write(const char* path, const float* u, int u0, int u1,
                    const float* s, int k, const float* vT, int v0, int v1) {
    char tmp[4096];
    int n = std::snprintf(tmp, sizeof tmp, "%s.tmp.%d", path,
                          static_cast<int>(::getpid()));
    if (n <= 0 || n >= static_cast<int>(sizeof tmp)) return -1;
    int fd = ::open(tmp, O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) return -1;

    bool ok = true;
    auto wr = [&](const void* p, size_t len) {
        const char* c = static_cast<const char*>(p);
        while (len && ok) {
            ssize_t m = ::write(fd, c, len);
            if (m <= 0) {
                ok = false;
                break;
            }
            c += m;
            len -= static_cast<size_t>(m);
        }
    };
    uint32_t hdr[8] = {kMagic, kVersion,
                       static_cast<uint32_t>(u0), static_cast<uint32_t>(u1),
                       static_cast<uint32_t>(k),
                       static_cast<uint32_t>(v0), static_cast<uint32_t>(v1),
                       0};
    wr(hdr, sizeof hdr);
    wr(u, sizeof(float) * static_cast<size_t>(u0) * u1);
    wr(s, sizeof(float) * static_cast<size_t>(k));
    wr(vT, sizeof(float) * static_cast<size_t>(v0) * v1);
    if (ok && ::fsync(fd) != 0) ok = false;
    ::close(fd);
    if (!ok || ::rename(tmp, path) != 0) {
        ::unlink(tmp);
        return -1;
    }
    return 0;
}

// dims out: [u_rows, u_cols, k, vT_rows, vT_cols]; 0 ok, -1 bad file.
int dpx_basis_read_header(const char* path, int* dims) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    uint32_t hdr[8];
    size_t n = std::fread(hdr, sizeof(uint32_t), 8, f);
    std::fclose(f);
    if (n != 8 || hdr[0] != kMagic || hdr[1] != kVersion) return -1;
    for (int i = 0; i < 5; ++i) dims[i] = static_cast<int>(hdr[2 + i]);
    return 0;
}

}  // extern "C"
