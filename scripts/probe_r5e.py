"""Round-5 wave-5: the n=8192 generality flex on device (VERDICT r4 item 8)
+ the reduction microbench under the amortized methodology.

n=8192 uses the qTESLA-III-speed prime (8404993 = 2^23+2^14+1, which is
1 mod 16384, so the unmodified registry derives psi/omega for n=8192 —
8x the reference's N<=1024 root ladder, main.cu:18-65) through the
unmodified flagship kernel (64 blocks, 6 wide stages, 22 MB digit tables).

Usage: python scripts/probe_r5e.py [--which all]
"""

import argparse
import sys

sys.path.insert(0, ".")

from qtesla_tpu.params import register_param_set       # noqa: E402
from qtesla_tpu.utils.timing import (benchmark_polymul,  # noqa: E402
                                     benchmark_reduction)


def probe_n8192():
    import numpy as np
    import jax.numpy as jnp
    from qtesla_tpu.ops.ntt_mxu import polymul_mxu_fn
    from qtesla_tpu.params import get_params
    from qtesla_tpu.utils.timing import measure

    register_param_set("qtesla3s-8192", n=8192, q=8404993)
    ps = get_params("qtesla3s-8192")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, ps.q, (2048, ps.n), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, ps.q, (2048, ps.n), dtype=np.uint32))
    # first a device bit-exactness spot-check vs the merged jnp pipeline
    from qtesla_tpu.models import polymul_negacyclic
    z = np.asarray(polymul_mxu_fn("qtesla3s-8192")(x[:2], y[:2]))
    want = np.asarray(polymul_negacyclic(x[:2], y[:2], ps, algo="merged"))
    np.testing.assert_array_equal(z, want)
    print("n8192 device bit-exact vs merged (B=2): OK", flush=True)
    for tile in (None, 32, 64):
        try:
            fn = polymul_mxu_fn("qtesla3s-8192", tile_b=tile)
            r = measure(fn, x, y, warmup=2, iters=100, chain=True,
                        inner=4, items_per_iter=2048,
                        name=f"n8192 tile={tile}")
            print(f"n8192 B=2048 tile={tile}: min {r.min_s*1e3:8.3f} "
                  f"ms/call -> {r.throughput_best/1e6:6.3f} M polymuls/s "
                  f"(= {r.throughput_best*8192/1e9:5.2f} G coeff/s)",
                  flush=True)
        except Exception as e:
            print(f"n8192 tile={tile} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def probe_micro():
    for op in ("addmod", "mulhi", "shoup", "barrett"):
        r = benchmark_reduction("qtesla-iii-speed", op, size=1 << 22,
                                iters=48, inner=4)
        print(f"micro x4 {op:8s}: {r.min_s*1e6:8.1f} us best -> "
              f"{r.throughput_best/1e9:6.2f} Gelem/s", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    sel = (args.which.split(",") if args.which != "all" else
           ["micro", "n8192"])
    for tag in sel:
        {"n8192": probe_n8192, "micro": probe_micro}[tag]()


if __name__ == "__main__":
    main()
