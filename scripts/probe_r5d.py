"""Round-5 wave-4: the committed benchmark-table refresh runs (VERDICT r4
items 2 and 6) on the real chip.

  subbatch  - flagship B in {512..32768}, inner=4 (amortized; the committed
              sub-batch sweep for docs/BENCHMARKS.md)
  latency   - per-call latency at B in {1, 2, 8} for all four qTESLA sets
              (inner=1: includes the per-step dispatch gap — the honest
              small-batch serving number; the reference ships BATCH=2,
              main.cuh:7)
  micro     - reduction-primitive Gelem/s (reference red_assembly analog)

Usage: python scripts/probe_r5d.py [--which all]
"""

import argparse
import sys

import numpy as np

import jax.numpy as jnp

sys.path.insert(0, ".")

from qtesla_tpu.ops import ntt_mxu as M                      # noqa: E402
from qtesla_tpu.utils.timing import (benchmark_polymul,      # noqa: E402
                                     benchmark_reduction, measure)

SETS = ("qtesla-i", "qtesla-iii-speed", "qtesla-p-i", "qtesla-p-iii")


def probe_subbatch():
    for B in (512, 1024, 2048, 4096, 8192, 16384, 32768):
        r = benchmark_polymul("qtesla-iii-speed", "mxu", batch=B,
                              iters=200, inner=4)
        print(f"subbatch B={B:6d}: min {r.min_s*1e6:9.2f} us/call -> "
              f"{r.throughput_best/1e6:6.2f} M/s", flush=True)


def probe_latency():
    for name in SETS:
        for B in (1, 2, 8):
            r = benchmark_polymul(name, "mxu", batch=B, iters=200, inner=1)
            print(f"latency {name:18s} B={B}: min {r.min_s*1e6:8.1f} us  "
                  f"med {r.median_s*1e6:8.1f} us", flush=True)


def probe_micro():
    for op in ("addmod", "mulhi", "shoup", "barrett"):
        r = benchmark_reduction("qtesla-iii-speed", op, size=1 << 22,
                                iters=50)
        print(f"micro {op:8s}: {r.min_s*1e6:8.1f} us best -> "
              f"{r.throughput_best/1e9:6.2f} Gelem/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    sel = (args.which.split(",") if args.which != "all" else
           ["subbatch", "latency", "micro"])
    for tag in sel:
        {"subbatch": probe_subbatch, "latency": probe_latency,
         "micro": probe_micro}[tag]()


if __name__ == "__main__":
    main()
