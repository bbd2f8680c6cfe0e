"""Device measurement of the sharded four-step LOCAL compute (the work one
chip does for its shard): fused MXU segment kernels vs the jnp Stockham
local path they replace (round-2 VERDICT item 2).

One chip in a (data=1, model=k) group holds (B, nloc=n/k) of every array;
per full polymul the chip runs seg1 twice (both operands), seg2 once, seg3
once, plus 3 all_to_alls (not measurable on one chip).  Aggregate
throughput of a k-chip group = B / t_local (k chips work concurrently), so
per-chip-normalized throughput = B / (k * t_local).

Usage: python scripts/probe_sp.py [--batch 16384] [--k 4]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from qtesla_tpu.parallel import sharded_mxu as SM                # noqa: E402
from qtesla_tpu.utils.timing import measure                      # noqa: E402

NAME = "qtesla-iii-speed"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()
    B, k = args.batch, args.k
    from qtesla_tpu.params import get_params
    ps = get_params(NAME)
    n = ps.n
    n1 = 1 << (ps.logn // 2)
    plans = SM.fourstep_mxu_plans(NAME, n1, k)
    nloc = plans.nloc
    tb = 256
    seg1 = SM._make_seg1(plans, tb, False)
    seg2 = SM._make_seg2(plans, tb, False)
    seg3 = SM._make_seg3(plans, tb, False)
    t1 = (jnp.asarray(plans.p1.W[:1]), jnp.asarray(plans.p1.const[:1]))
    t2 = (jnp.asarray(plans.p2f.W), jnp.asarray(plans.p2f.const),
          jnp.asarray(plans.p2i.W[:1]), jnp.asarray(plans.p2i.const[:1]))
    t3 = (jnp.asarray(plans.p3.W[:1]), jnp.asarray(plans.p3.const[:1]))

    @jax.jit
    def local_pipeline(x, y):
        vx = seg1(x, *t1)
        vy = seg1(y, *t1)
        w = seg2(vx, vy, *t2)
        return seg3(w, *t3)

    # jnp Stockham local equivalent (what round 1 shipped): per chip,
    # column NTT over n1 on (B, n1, n2k) + twiddle; row NTT over n2 on
    # (B, n1k, n2); pointwise; and the inverse mirror
    from qtesla_tpu.ops import ntt as N
    from qtesla_tpu.ops.modmul import shoup_mulmod
    from qtesla_tpu.ops.ntt import _subtables
    from qtesla_tpu.parallel.sharded import _fourstep_tables
    T = _fourstep_tables(NAME, n1)
    st1, st2 = _subtables(NAME, n1), _subtables(NAME, n2b := n // n1)
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
        Z = N.pointwise_mul(X, Y, SM.get_tables(NAME))
        w = shoup_mulmod(N.stockham_inv(Z, st2), Wi[None, :, :],
                         Wish[None, :, :], ps.q)
        w = w.reshape(B, n1, n2k)
        v = jnp.swapaxes(N.stockham_inv(jnp.swapaxes(w, -1, -2), st1),
                         -1, -2)
        return shoup_mulmod(v, jnp.asarray(T["ipsi"][:, :n2k]),
                            jnp.asarray(T["ipsi_sh"][:, :n2k]), ps.q)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, ps.q, (B, nloc), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, ps.q, (B, nloc), dtype=np.uint32))
    r = measure(local_pipeline, x, y, warmup=2, iters=args.iters,
                chain=True, items_per_iter=B, name=f"sp_local_mxu[k={k}]")
    print(f"{r.line()}  -> per-chip-normalized "
          f"{B / (k * r.min_s) / 1e6:.2f} M polymuls/s/chip", flush=True)
    x3 = x.reshape(B, n1, n2k)
    y3 = y.reshape(B, n1, n2k)
    r2 = measure(jnp_local_pipeline, x3, y3, warmup=2, iters=args.iters,
                 chain=True, items_per_iter=B, name=f"sp_local_jnp[k={k}]")
    print(f"{r2.line()}  -> per-chip-normalized "
          f"{B / (k * r2.min_s) / 1e6:.2f} M polymuls/s/chip", flush=True)
    print(f"mxu/jnp local speedup: {r2.min_s / r.min_s:.2f}x", flush=True)


if __name__ == "__main__":
    main()
