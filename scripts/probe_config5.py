"""On-chip config-5 variant sweep (VERDICT r4 item 2): SDXL-1024 CLI-spec
pullback (mid tap, r=8 x 5 iters, bf16 weights) across probe chunk_size and
remat, to find the production recipe bench_sdxl_pullback should measure.

Usage:  python scripts/probe_config5.py [chunk,remat ...]
        default grid: 2,1 4,1 8,1 4,0 8,0   (chunk, remat-flag)

Each variant prints one line; compile faults are recorded, not fatal —
the same discipline as scripts/probe_compile_faults.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from bench import _sync, bench_sdxl_pullback  # noqa: E402


def main():
    variants = sys.argv[1:] or ["2,1", "4,1", "8,1", "4,0", "8,0"]
    for spec in variants:
        chunk, remat = (int(x) for x in spec.split(","))
        t0 = time.perf_counter()
        try:
            out = bench_sdxl_pullback(rank=8, iters=5, chunk=chunk,
                                      with_mfu=True, remat=bool(remat))
            print(f"chunk={chunk} remat={bool(remat)}: {out['value']} s "
                  f"(mfu={out.get('mfu_vs_bf16_peak')}, "
                  f"wall={time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"chunk={chunk} remat={bool(remat)}: "
                  f"{type(e).__name__}: {str(e)[:200]} "
                  f"(wall={time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
