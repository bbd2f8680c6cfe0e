"""Device measurement of the sharded four-step LOCAL compute (the work one
chip does for its shard): block-split MXU segment kernels vs the jnp
Stockham local path and vs the single-chip flagship kernel.

One chip in a (data=1, model=k) group holds (B, nloc=n/k) of every array;
per full polymul the chip runs seg1 twice (both operands), seg2 once, seg3
once, plus 3 all_to_alls (not measurable on one chip).  Aggregate
throughput of a k-chip group = B / t_local (k chips work concurrently), so
per-chip-normalized throughput = B / (k * t_local), and the "SP tax" =
k * t_local / t_flagship (1.0 = perfect: a k-chip group matches k
independent chips running the flagship kernel).

Usage: python scripts/probe_sp.py [--batch 16384] [--k 2,4,8]
                                  [--name qtesla-iii-speed] [--jnp]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from qtesla_tpu.parallel import sharded_mxu as SM                # noqa: E402
from qtesla_tpu.utils.timing import (benchmark_polymul,          # noqa: E402
                                     benchmark_sp_local, measure)


def run_k(name, k, B, iters, ps, include_jnp):
    n1 = 1 << (ps.logn // 2)
    r, _ = benchmark_sp_local(name, k, batch=B, iters=iters, n1=n1)
    print(f"{r.line()}  -> per-chip-normalized "
          f"{B / (k * r.min_s) / 1e6:.2f} M polymuls/s/chip", flush=True)

    if include_jnp:
        _run_jnp(name, k, B, iters, ps, n1)
    return r


def _run_jnp(name, k, B, iters, ps, n1):
    """jnp Stockham local equivalent (what round 1 shipped)."""
    from qtesla_tpu.ops import ntt as N
    from qtesla_tpu.ops.modmul import shoup_mulmod
    from qtesla_tpu.ops.ntt import _subtables
    from qtesla_tpu.parallel.sharded import _fourstep_tables
    T = _fourstep_tables(name, n1)
    n2b = ps.n // n1
    st1, st2 = _subtables(name, n1), _subtables(name, n2b)
    n2k, n1k = n2b // k, n1 // k
    phi = jnp.asarray(T["phi"][:, :n2k])
    phis = jnp.asarray(T["phi_sh"][:, :n2k])
    W = jnp.asarray(T["W"][:, :n2k])
    Wsh = jnp.asarray(T["W_sh"][:, :n2k])
    Wi = jnp.asarray(T["Winv"][:n1k])
    Wish = jnp.asarray(T["Winv_sh"][:n1k])

    def jnp_fwd(xl):
        v = shoup_mulmod(xl, phi, phis, ps.q)
        v = jnp.swapaxes(N.stockham_fwd(jnp.swapaxes(v, -1, -2), st1),
                         -1, -2)
        return shoup_mulmod(v, W, Wsh, ps.q)

    @jax.jit
    def jnp_local_pipeline(x3, y3):
        vx = jnp_fwd(x3).reshape(B, n1k, n2b)
        vy = jnp_fwd(y3).reshape(B, n1k, n2b)
        X = N.stockham_fwd(vx, st2)
        Y = N.stockham_fwd(vy, st2)
        Z = N.pointwise_mul(X, Y, SM.get_tables(name))
        w = shoup_mulmod(N.stockham_inv(Z, st2), Wi[None, :, :],
                         Wish[None, :, :], ps.q)
        w = w.reshape(B, n1, n2k)
        v = jnp.swapaxes(N.stockham_inv(jnp.swapaxes(w, -1, -2), st1),
                         -1, -2)
        return shoup_mulmod(v, jnp.asarray(T["ipsi"][:, :n2k]),
                            jnp.asarray(T["ipsi_sh"][:, :n2k]), ps.q)

    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.integers(0, ps.q, (B, n1, n2k), dtype=np.uint32))
    y3 = jnp.asarray(rng.integers(0, ps.q, (B, n1, n2k), dtype=np.uint32))
    r2 = measure(jnp_local_pipeline, x3, y3, warmup=2, iters=iters,
                 chain=True, items_per_iter=B,
                 name=f"sp_local_jnp[{name},k={k}]")
    print(f"{r2.line()}  -> per-chip-normalized "
          f"{B / (k * r2.min_s) / 1e6:.2f} M polymuls/s/chip", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--k", default="2,4,8")
    ap.add_argument("--name", default="qtesla-iii-speed")
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--jnp", action="store_true",
                    help="also time the round-1 jnp local path")
    ap.add_argument("--ulysses", action="store_true",
                    help="also time the Ulysses local surface (the "
                         "flagship at B/k — the default SP for B >= k)")
    ap.add_argument("--fixed", action="store_true",
                    help="also time the fixed-operand SP locals "
                         "(unfolded + round-4 folded)")
    args = ap.parse_args()
    from qtesla_tpu.params import get_params
    ps = get_params(args.name)
    flag = benchmark_polymul(args.name, "mxu", batch=args.batch,
                             iters=args.iters)
    print(f"{flag.line()}", flush=True)
    for k in [int(v) for v in args.k.split(",")]:
        r = run_k(args.name, k, args.batch, args.iters, ps, args.jnp)
        tax = k * r.min_s / flag.min_s
        print(f"  SP tax at k={k}: {tax:.2f}x  "
              f"(k*t_local {k * r.min_s * 1e3:.3f} ms vs flagship "
              f"{flag.min_s * 1e3:.3f} ms)", flush=True)
        if args.ulysses:
            from qtesla_tpu.utils.timing import benchmark_ulysses_local
            ru = benchmark_ulysses_local(args.name, k, batch=args.batch,
                                         iters=args.iters)
            print(f"{ru.line()}  SP-tax {k * ru.min_s / flag.min_s:.2f}x "
                  f" -> per-chip-normalized "
                  f"{args.batch / (k * ru.min_s) / 1e6:.2f} M/s", flush=True)
        if args.fixed:
            from qtesla_tpu.utils.timing import (
                benchmark_sp_local_fixed, benchmark_sp_local_fixed_folded)
            rf, _ = benchmark_sp_local_fixed(args.name, k,
                                             batch=args.batch,
                                             iters=args.iters)
            print(f"{rf.line()}", flush=True)
            rx, _ = benchmark_sp_local_fixed_folded(args.name, k,
                                                    batch=args.batch,
                                                    iters=args.iters)
            print(f"{rx.line()}  folded speedup "
                  f"{rf.min_s / rx.min_s:.2f}x", flush=True)


if __name__ == "__main__":
    main()
