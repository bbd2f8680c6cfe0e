"""Round-5 device probes: flagship sub-batch efficiency + the two untried
round-4 leads (VERDICT r4 items 1-2).

Probes (select with --which, comma-separated):

  subbatch     - flagship at B in {512..16384}, default tile: the committed
                 sub-batch sweep (VERDICT r4 item 2)
  tilesweep    - B=2048 with tile_b in {64,128,256,512,1024,2048}: does the
                 auto-picked 256x8-step grid lose to other shapes?
  launch       - per-pallas_call fixed overhead: z=x+1 over ONE tiny grid
                 step, chained 400x in a scan - per-iter time is launch +
                 ~2us DMA.  If ~35-40us, it explains BOTH the 0.105ms gap
                 at B=16384 (64 steps) and the B=2048 sub-batch tax.
  launch_tab   - same tiny kernel but with the flagship's 7 table operands
                 resident: the delta vs `launch` is per-call table staging.
  dma_same_b   - trivial-compute kernel with the flagship's exact signature
                 at B in {2048, 16384}: pipeline+DMA floor per batch size.
  bdot         - batched dot_general over the nb=8 blocks vs the shipped
                 loop-of-dots, at the kernel's exact shapes (VERDICT r4
                 item 1 lead: "batched dot_general over the 8 blocks").

Usage: python scripts/probe_r5.py [--which all] [--iters 200]
"""

import argparse
import functools
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


def probe_subbatch(iters):
    mt = M.get_mxu_tables(NAME)
    rng = np.random.default_rng(0)
    for B in (512, 1024, 2048, 4096, 8192, 16384):
        x = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
        fn = M.polymul_mxu_fn(NAME)
        report(f"flagship B={B}", fn, x, y, iters=iters, items=B)


def probe_tilesweep(iters):
    mt = M.get_mxu_tables(NAME)
    rng = np.random.default_rng(0)
    B = 2048
    x = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, mt.q, (B, mt.n), dtype=np.uint32))
    for tb in (64, 128, 256, 512, 1024, 2048):
        fn = M.polymul_mxu_fn(NAME, tile_b=tb)
        report(f"flagship B={B} tile={tb}", fn, x, y, iters=iters, items=B)


def _launch_fn(with_tables: bool):
    mt = M.get_mxu_tables(NAME)
    names, arrs, tab_specs = M._table_inputs(mt, True, True)
    n = mt.n
    tb = 8

    def kernel(*refs):
        refs[-1][:] = refs[0][:] + jnp.uint32(1)

    in_specs = [pl.BlockSpec((tb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    extra = ()
    if with_tables:
        in_specs += tab_specs
        extra = tuple(arrs)

    @jax.jit
    def fn(x):
        return pl.pallas_call(
            kernel, grid=(1,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((tb, n), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x, *extra)
    return fn, tb, n


def probe_launch(iters, with_tables=False):
    fn, tb, n = _launch_fn(with_tables)
    x = jnp.zeros((tb, n), jnp.uint32)
    tag = "launch+tables" if with_tables else "launch"
    report(tag, fn, x, iters=iters)


def probe_dma_same_b(iters):
    mt = M.get_mxu_tables(NAME)
    names, arrs, tab_specs = M._table_inputs(mt, True, True)
    n = mt.n

    def kernel(*refs):
        refs[-1][:] = refs[0][:] + refs[1][:]

    run = M._flatten_batch(
        M._make_runner(kernel, mt, 2, names, arrs, tab_specs, 256, False),
        n)
    fn = jax.jit(run)
    rng = np.random.default_rng(0)
    for B in (2048, 16384):
        x = jnp.asarray(rng.integers(0, mt.q, (B, n), dtype=np.uint32))
        y = jnp.asarray(rng.integers(0, mt.q, (B, n), dtype=np.uint32))
        report(f"dma_same B={B}", fn, x, y, iters=iters, items=B)


def probe_bdot(iters):
    """Loop-of-dots (shipped) vs one batched dot_general over the nb
    blocks, inside a Pallas kernel at the flagship's exact shapes:
    planes (TB, nb*bw) reshaped/transposed to (nb, TB, bw) int8 against
    W (nb, bw, Dout*bw) int8.  Also a variant where the lhs is already
    (nb, TB, bw)-shaped in VMEM (the transpose cost isolated)."""
    mt = M.get_mxu_tables(NAME)
    nb, bw, D = mt.nb, mt.bw, mt.D
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
    REP = 8          # repeat the dots inside the kernel to swamp launch

    # NOTE: outputs are cast back to int8 in the INPUT's shape so the
    # chained scan carry round-trips (the first committed version returned
    # int32 (TB, nb*bw) and every case failed at trace time with a scan
    # carry-type mismatch; probe_r5c.py carries the canonical REP=128
    # version of this probe and its measured rejection)
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
        ("dots loop x8", k_loop, spec2, spec2,
         jax.ShapeDtypeStruct((TB, nb * bw), jnp.int8), xs),
        ("dots batched x8", k_batched, spec2, spec2,
         jax.ShapeDtypeStruct((TB, nb * bw), jnp.int8), xs),
        ("dots batched-pre x8", k_batched_pre, spec3, spec3,
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
                  f"{str(e)[:200]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all")
    ap.add_argument("--iters", type=int, default=200)
    args = ap.parse_args()
    sel = (args.which.split(",") if args.which != "all" else
           ["launch", "launch_tab", "dma_same_b", "subbatch", "tilesweep",
            "bdot"])
    for tag in sel:
        if tag == "subbatch":
            probe_subbatch(args.iters)
        elif tag == "tilesweep":
            probe_tilesweep(args.iters)
        elif tag == "launch":
            probe_launch(args.iters)
        elif tag == "launch_tab":
            probe_launch(args.iters, with_tables=True)
        elif tag == "dma_same_b":
            probe_dma_same_b(args.iters)
        elif tag == "bdot":
            probe_bdot(args.iters)
        else:
            print(f"unknown probe {tag}", flush=True)


if __name__ == "__main__":
    main()
