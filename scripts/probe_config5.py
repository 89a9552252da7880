"""config5 (SDXL-1024 CLI-spec pullback) single-chip recipe sweep.

VERDICT r4 item 2: the 4.73 s headline ran one fixed recipe (chunk=2,
remat=True); this probe measures the (chunk_size, remat) grid so the bench
default is the measured-best single-chip recipe, and records each attempt
incrementally (a watchdog kill still leaves all completed rows on disk).

Usage:  python scripts/probe_config5.py [out.json]
Each row reuses bench.bench_sdxl_pullback — the exact section the matrix
runs — with MFU lowering skipped per row (fits are shared/cached anyway).

Reference workload: the attention program the reference must run unfused
(/root/reference/src/utils/utils.py:322-323 disables xformers for jacfwd);
this sweep is TPU-side tuning the torch reference has no analogue for.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probe_c5_sweep.json"

# measured-first order: the current default recipe goes first so a partial
# sweep still reproduces the baseline number. r5 measured (2026-08-20):
# chunk8+block-remat 3.36-3.49 s, chunk4 4.00 s, chunk2 5.13 s; every
# remat=False row OOMs 16G HBM (linearize residuals at SDXL scale), and the
# no-block-remat linearized program also compiles ~30 min — keep remat on.
GRID = [
    {"chunk": 8, "remat": True},   # r5 headline recipe (3.36 s)
    {"chunk": 4, "remat": True},
    {"chunk": 2, "remat": True},   # r4 headline recipe (4.73-5.13 s)
    {"chunk": 4, "remat": False},
    {"chunk": 2, "remat": False},
    {"chunk": 8, "remat": False},
]


def main():
    os.environ.setdefault("DPB_BENCH_NO_MFU", "1")
    import bench

    rows = []
    for spec in GRID:
        t0 = time.time()
        label = f"chunk{spec['chunk']}{'_remat' if spec['remat'] else ''}"
        try:
            r = bench.bench_sdxl_pullback(
                rank=8, iters=5, chunk=spec["chunk"], with_mfu=False,
                remat=spec["remat"])
            row = {"label": label, "sec": r["value"],
                   "wall": round(time.time() - t0, 1)}
        except Exception as e:
            row = {"label": label,
                   "error": f"{type(e).__name__}: {str(e)[:300]}",
                   "wall": round(time.time() - t0, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        with open(OUT, "w") as f:
            json.dump(rows, f, indent=1)
            f.write("\n")
    timed = [r for r in rows if "sec" in r]
    if timed:
        best = min(timed, key=lambda r: r["sec"])
        print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
