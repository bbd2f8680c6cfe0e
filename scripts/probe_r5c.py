"""Round-5 wave-3 probes: decompose the ~115us/call cost that does not
amortize at B=2048, measure the amortized sub-batch curve, A/B the class-sum
SP boundary, and resolve the batched-dot lead at a resolvable scale.

  dma_r       - dma_same (flagship signature, trivial compute) at
                B in {2048, 16384} with r in {1, 4} calls/step: if its
                marginal per-call cost is ~free, the flagship's 115us/call
                is program-content-dependent (Mosaic program load), not
                generic launch.
  flag_r      - flagship amortized curve: B in {2048, 4096, 8192, 32768}
                at r=4 (B=2048 also tiles 512/1024/2048): the honest
                sub-batch story with the step overhead amortized.
  spclasses   - sp_local vs sp_local_classes at k in {4, 8}, B=16384
                (VERDICT r4 item 3 A/B, r=1 matching the round-4 rows).
  bdot        - loop-of-dots vs batched dot_general, REP=128 (~64us MXU,
                resolvable over the ~120us step overhead).

Usage: python scripts/probe_r5c.py [--which all]
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
    print(f"{tag:34s} min {r.min_s*1e6:9.2f} us  med "
          f"{r.median_s*1e6:9.2f} us"
          + (f"  -> {r.throughput_best/1e6:6.2f} M/s" if items > 1 else ""),
          flush=True)
    return r


def _rep(fn, r):
    def g(x, c):
        for _ in range(r):
            c = fn(x, c)
        return c
    return jax.jit(g)


def probe_dma_r():
    mt = M.get_mxu_tables(NAME)
    names, arrs, tab_specs = M._table_inputs(mt, True, True)

    def kernel(*refs):
        refs[-1][:] = refs[0][:] + refs[1][:]

    run = M._flatten_batch(
        M._make_runner(kernel, mt, 2, names, arrs, tab_specs, 256, False),
        mt.n)
    base = jax.jit(run)
    rng = np.random.default_rng(0)
    for B in (2048, 16384):
        x = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        for r in (1, 4):
            report(f"dma_same B={B} r={r}", _rep(base, r), x, y,
                   iters=200 // r, items=B * r)


def probe_flag_r():
    mt = M.get_mxu_tables(NAME)
    rng = np.random.default_rng(0)
    for B, tile in ((2048, None), (2048, 512), (2048, 1024), (2048, 2048),
                    (4096, None), (8192, None), (32768, None)):
        x = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        base = M.polymul_mxu_fn(NAME, tile_b=tile)
        tag = f"flagship B={B} r=4" + (f" tile={tile}" if tile else "")
        report(tag, _rep(base, 4), x, y, iters=50, items=B * 4)


def probe_spclasses():
    from qtesla_tpu.utils.timing import (benchmark_sp_local,
                                         benchmark_sp_local_classes)
    for k in (4, 8):
        r, _ = benchmark_sp_local(NAME, k, batch=16384, iters=400)
        print(f"sp_local k={k}: {r.line()}", flush=True)
        r, plans, cp = benchmark_sp_local_classes(NAME, k, batch=16384,
                                                  iters=400)
        print(f"sp_local_classes k={k}: {r.line()}  "
              f"[consumer dots/block {sum(cp.dins)} vs unfolded "
              f"{plans.p2f.din}; a2a#1 bytes x{cp.Dout}]", flush=True)


def probe_bdot():
    mt = M.get_mxu_tables(NAME)
    nb, bw = mt.nb, mt.bw
    TB = 256
    Wnp = np.asarray(mt.wf[:, 0])
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
    REP = 128

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
        ("dots loop x128", k_loop, spec2, spec2,
         jax.ShapeDtypeStruct((TB, nb * bw), jnp.int8), xs),
        ("dots batched x128", k_batched, spec2, spec2,
         jax.ShapeDtypeStruct((TB, nb * bw), jnp.int8), xs),
        ("dots batched-pre x128", k_batched_pre, spec3, spec3,
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
            report(tag, fn, xin, iters=100)
        except Exception as e:
            print(f"{tag:34s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    args = ap.parse_args()
    sel = (args.which.split(",") if args.which != "all" else
           ["dma_r", "flag_r", "spclasses", "bdot"])
    for tag in sel:
        {"dma_r": probe_dma_r, "flag_r": probe_flag_r,
         "spclasses": probe_spclasses, "bdot": probe_bdot}[tag]()


if __name__ == "__main__":
    main()
