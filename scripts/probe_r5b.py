"""Round-5 follow-up probes: attribute the ~120us fixed per-iteration cost
(probe_r5.py `launch`) to pallas launch vs scan-step overhead, and measure
the flagship's MARGINAL per-call time by amortizing it (r kernel calls per
scan step).

  scan_nop    - chained scan whose body is ONE jnp add on a tiny array:
                pure scan-step overhead of this backend (no pallas).
  floor3      - 3-array Pallas stream at B=16384 tile 256 (round-2 baseline
                364us): re-measure on today's chip.
  flagship_r  - flagship at B in {2048, 16384} with r in {1, 2, 4} calls per
                scan step; marginal per-call time = (t(r2)-t(r1))/(r2-r1).
  bdot        - the batched-dot_general lead, fixed carry dtypes.

Usage: python scripts/probe_r5b.py [--which all] [--iters 200]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from qtesla_tpu.ops import ntt_mxu as M                      # noqa: E402
from qtesla_tpu.utils.timing import measure                  # noqa: E402

NAME = "qtesla-iii-speed"


def report(tag, fn, *a, iters=200, items=1):
    r = measure(fn, *a, warmup=2, iters=iters, chain=True,
                items_per_iter=items, name=tag)
    print(f"{tag:28s} min {r.min_s*1e6:9.2f} us  med {r.median_s*1e6:9.2f} us"
          + (f"  -> {r.throughput_best/1e6:6.2f} M/s" if items > 1 else ""),
          flush=True)
    return r


def probe_scan_nop(iters):
    fn = jax.jit(lambda x, c: c + x)
    x = jnp.ones((8, 128), jnp.uint32)
    report("scan_nop (8,128)", fn, x, x, iters=iters)
    xb = jnp.ones((2048, 1024), jnp.uint32)
    report("scan_nop (2048,1024)", fn, xb, xb, iters=iters)


def probe_floor3(iters):
    mt = M.get_mxu_tables(NAME)
    n, tb = mt.n, 256

    def kernel(x_ref, y_ref, z_ref):
        z_ref[:] = x_ref[:] + y_ref[:]

    @jax.jit
    def fn(x, y):
        B = x.shape[0]
        return pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=[pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32))(x, y)

    rng = np.random.default_rng(0)
    for B in (2048, 16384):
        x = jnp.asarray(rng.integers(0, mt.q, (B, n), dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, mt.q, (B, n), dtype=np.uint32))
        report(f"floor3 B={B}", fn, x, y, iters=iters, items=B)


def probe_flagship_r(iters):
    mt = M.get_mxu_tables(NAME)
    rng = np.random.default_rng(0)
    base = M.polymul_mxu_fn(NAME)
    for B in (2048, 16384):
        x = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        for r in (1, 2, 4):
            def fn(xv, c, r=r):
                for _ in range(r):
                    c = base(xv, c)
                return c
            report(f"flagship B={B} r={r}", jax.jit(fn), x, y,
                   iters=max(50, iters // r), items=B * r)


def probe_bdot(iters):
    mt = M.get_mxu_tables(NAME)
    nb, bw = mt.nb, mt.bw
    TB = 256
    Wnp = np.asarray(mt.wf[:, 0])                    # (nb, bw, D*bw) int8
    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.integers(-128, 128, (TB, nb * bw), dtype=np.int8))
    xs3 = jnp.asarray(rng.integers(-128, 128, (nb, TB, bw), dtype=np.int8))
    W = jnp.asarray(Wnp)

    spec2 = pl.BlockSpec((TB, nb * bw), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    specw = pl.BlockSpec(W.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    spec3 = pl.BlockSpec((nb, TB, bw), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    REP = 16         # swamp the fixed per-iteration cost

    def k_loop(x_ref, w_ref, o_ref):
        acc = None
        for _ in range(REP):
            for b in range(nb):
                p = lax.dot_general(
                    x_ref[:, b * bw:(b + 1) * bw], w_ref[b],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                s = p[:, :bw] + p[:, bw:2 * bw] + p[:, 2 * bw:]
                acc = s if acc is None else acc + s
        o_ref[:] = jnp.tile(acc.astype(jnp.int8), (1, nb))

    def k_batched(x_ref, w_ref, o_ref):
        acc = None
        for _ in range(REP):
            x3 = x_ref[:].reshape(TB, nb, bw).transpose(1, 0, 2)
            p = lax.dot_general(x3, w_ref[:],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
            s = (p[..., :bw] + p[..., bw:2 * bw] + p[..., 2 * bw:]).sum(0)
            acc = s if acc is None else acc + s
        o_ref[:] = jnp.tile(acc.astype(jnp.int8), (1, nb))

    def k_batched_pre(x_ref, w_ref, o_ref):
        acc = None
        for _ in range(REP):
            p = lax.dot_general(x_ref[:], w_ref[:],
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.int32)
            s = (p[..., :bw] + p[..., bw:2 * bw] + p[..., 2 * bw:]).sum(0)
            acc = s if acc is None else acc + s
        o_ref[:] = jnp.broadcast_to(
            acc.astype(jnp.int8)[None], (nb, TB, bw))

    cases = [
        ("dots loop x16", k_loop, spec2, spec2,
         jax.ShapeDtypeStruct((TB, nb * bw), jnp.int8), xs),
        ("dots batched x16", k_batched, spec2, spec2,
         jax.ShapeDtypeStruct((TB, nb * bw), jnp.int8), xs),
        ("dots batched-pre x16", k_batched_pre, spec3, spec3,
         jax.ShapeDtypeStruct((nb, TB, bw), jnp.int8), xs3),
    ]
    for tag, kern, spec_x, spec_o, oshape, xin in cases:
        @jax.jit
        def fn(xv, kern=kern, spec_x=spec_x, spec_o=spec_o, oshape=oshape):
            return pl.pallas_call(
                kern, grid=(1,),
                in_specs=[spec_x, specw], out_specs=spec_o,
                out_shape=oshape,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )(xv, W)
        try:
            report(tag, fn, xin, iters=iters)
        except Exception as e:
            print(f"{tag:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    sel = (args.which.split(",") if args.which != "all" else
           ["scan_nop", "floor3", "flagship_r", "bdot"])
    for tag in sel:
        {"scan_nop": probe_scan_nop, "floor3": probe_floor3,
         "flagship_r": probe_flagship_r, "bdot": probe_bdot}[tag](args.iters)


if __name__ == "__main__":
    main()
