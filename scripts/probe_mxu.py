"""Device probes for the flagship MXU kernel's streaming-efficiency gap
(round-2 VERDICT item 1).  Measures, on the real chip:

  floor3/floor2  - pure 3-/2-array Pallas streaming at the kernel's exact
                   tile shape (the in-Pallas DMA floor)
  full           - the shipped polymul kernel
  dma_same       - same pallas_call signature (tables resident, same grid)
                   but trivial compute: isolates pipeline/DMA cost with the
                   kernel's own buffer configuration
  fwd1/fwd2      - 1 vs 2 forward transforms, same streams: the time delta
                   is pure exposed compute (overlap diagnostic)

Usage: python scripts/probe_mxu.py [--batch 16384] [--tile 256] [--which all]
       [--param-set qtesla-iii-speed]
"""

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from qtesla_tpu.ops import ntt_mxu as M                      # noqa: E402
from qtesla_tpu.utils.timing import measure                  # noqa: E402

NAME = "qtesla-iii-speed"       # default; override with --param-set


def _specs(n, tb, k):
    return [pl.BlockSpec((tb, n), lambda i: (i, 0),
                         memory_space=pltpu.VMEM) for _ in range(k)]


def stream_fn(n, tb, narr):
    """narr-array elementwise stream (read narr-1, write 1)."""
    if narr == 3:
        def kernel(x_ref, y_ref, z_ref):
            z_ref[:] = x_ref[:] + y_ref[:]
    else:
        def kernel(x_ref, z_ref):
            z_ref[:] = x_ref[:] + jnp.uint32(1)

    @jax.jit
    def fn(*args):
        B = args[0].shape[0]
        return pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=_specs(n, tb, narr - 1),
            out_specs=_specs(n, tb, 1)[0],
            out_shape=jax.ShapeDtypeStruct((B, n), jnp.uint32))(*args)
    return fn


def compute_only_fn(name, tb, B, which="compute_only"):
    """The full kernel body over the same grid, but with CONSTANT block
    index maps: each operand block is fetched once (invariant inputs are
    not re-fetched per grid step — measured round 1), so the loop time is
    pure compute+MXU with no streaming.  Separates compute-bound from
    DMA-bound."""
    mt = M.get_mxu_tables(name)
    names, arrs, specs = M._table_inputs(mt, True, True)
    n = mt.n

    import jax.numpy as jnp2

    def kernel(*refs):
        x_ref, y_ref = refs[0], refs[1]
        z_ref = refs[-1]
        tab = dict(zip(names, refs[2:-1]))
        blocks = M._split_blocks(x_ref, mt)
        if which == "co_wide":                    # wide stages only
            M._store_blocks(z_ref, M._fwd_rolls(blocks, mt), mt)
            return
        if which == "co_store":                   # load + store only
            M._store_blocks(z_ref, blocks, mt)
            return
        if which == "co_shoup8":                  # 8 tile shoups (= 2 stages'
            from qtesla_tpu.ops.modmul import shoup_mulmod_sloppy  # noqa
            ws = mt.tbl.ct_fwd_stages[0][0].reshape(-1)
            wsh = mt.tbl.ct_fwd_stages[0][1].reshape(-1)
            M._store_blocks(z_ref, [
                shoup_mulmod_sloppy(b_, np.uint32(ws[0]), np.uint32(wsh[0]),
                                    mt.q) for b_ in blocks], mt)
            return
        if which == "co_addsub":                  # adds/subs only, 3 stages
            for _ in range(3):
                half = len(blocks) // 2
                blocks = ([blocks[k] + blocks[half + k] for k in range(half)]
                          + [blocks[k] - blocks[half + k] +
                             np.uint32(4 * mt.q) for k in range(half)])
            M._store_blocks(z_ref, blocks, mt)
            return
        if which == "co_split":                   # wide + digit split
            blocks = M._fwd_rolls(blocks, mt)
            outs = []
            for blk in blocks:
                planes = M._digit_planes(blk, mt.fwd_off, mt.Df, mt.fwd_base)
                acc = planes[0].astype(jnp2.uint32)
                for p in planes[1:]:
                    acc = acc + p.astype(jnp2.uint32)
                outs.append(acc)
            M._store_blocks(z_ref, outs, mt)
            return
        if which == "co_dots":                    # wide + split + MXU dots
            from jax import lax as lax2
            blocks = M._fwd_rolls(blocks, mt)
            outs = []
            for b, blk in enumerate(blocks):
                planes = M._digit_planes(blk, mt.fwd_off, mt.Df, mt.fwd_base)
                acc = None
                for i in range(mt.Df):
                    p = lax2.dot_general(
                        planes[i], tab["wf"][b, i], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp2.int32)
                    acc = p if acc is None else acc + p
                outs.append(acc[:, :mt.bw].astype(jnp2.uint32))
            M._store_blocks(z_ref, outs, mt)
            return
        X = M._fwd_mxu(blocks, tab, mt)           # + recombination
        if which == "co_fwd1":
            M._store_blocks(z_ref, X, mt)
            return
        Y = M._fwd_mxu(M._split_blocks(y_ref, mt), tab, mt)
        Z = [M._pointwise(xb, yb, mt) for xb, yb in zip(X, Y)]
        M._store_blocks(z_ref, M._inv_mxu(Z, tab, mt), mt)

    const_spec = pl.BlockSpec((tb, n), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)

    @jax.jit
    def fn(x, y):
        return pl.pallas_call(
            kernel, grid=(B // tb,),
            in_specs=[const_spec, const_spec] + specs,
            out_specs=const_spec,
            out_shape=jax.ShapeDtypeStruct((tb, n), jnp.uint32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
        )(x[:tb], y[:tb], *arrs)
    return fn


def variant_fn(name, tb, which):
    """Custom kernels sharing the shipped kernel's exact call signature."""
    mt = M.get_mxu_tables(name)
    names, arrs, specs = M._table_inputs(mt, True, True)

    def kernel(*refs):
        x_ref, y_ref = refs[0], refs[1]
        z_ref = refs[-1]
        tab = dict(zip(names, refs[2:-1]))
        if which == "dma_same":
            z_ref[:] = x_ref[:] + y_ref[:]
            return
        X = M._fwd_mxu(M._split_blocks(x_ref, mt), tab, mt)
        if which == "fwd1":
            M._store_blocks(z_ref, [M._csub(M._reduce_2q(v, mt), mt.q)
                                    for v in X], mt)
            return
        Y = M._fwd_mxu(M._split_blocks(y_ref, mt), tab, mt)
        if which == "fwd2":
            M._store_blocks(
                z_ref, [M._csub(M._reduce_2q(a + b, mt), mt.q)
                        for a, b in zip(X, Y)], mt)
            return
        Z = [M._pointwise(xb, yb, mt) for xb, yb in zip(X, Y)]
        if which == "nopointwise":
            Z = [M._csub(M._reduce_2q(xb + yb, mt), mt.q)
                 for xb, yb in zip(X, Y)]
        M._store_blocks(z_ref, M._inv_mxu(Z, tab, mt), mt)

    run = M._flatten_batch(
        M._make_runner(kernel, mt, 2, names, arrs, specs, tb, False), mt.n)
    return jax.jit(run)


def main():
    global NAME
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--which", default="all")
    ap.add_argument("--param-set", default=NAME)
    args = ap.parse_args()
    NAME = args.param_set
    mt = M.get_mxu_tables(NAME)
    n, q = mt.n, mt.q
    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, q, (B, n), dtype=np.uint32))
    y = jnp.asarray(rng.integers(0, q, (B, n), dtype=np.uint32))

    sel = args.which.split(",") if args.which != "all" else [
        "floor3", "floor2", "full", "dma_same", "fwd1", "fwd2"]
    gb = B * n * 4 / 1e9

    def report(tag, fn, narr, *a):
        r = measure(fn, *a, warmup=2, iters=args.iters, chain=True,
                    items_per_iter=B, name=tag)
        eff_gbps = narr * gb / r.min_s
        print(f"{tag:12s} min {r.min_s*1e3:7.3f} ms  med "
              f"{r.median_s*1e3:7.3f} ms  -> {r.throughput_best/1e6:6.2f} "
              f"M/s  ({eff_gbps:5.1f} GB/s over {narr} arrays)", flush=True)
        return r

    for tag in sel:
        if tag == "floor3":
            report(tag, stream_fn(n, args.tile, 3), 3, x, y)
        elif tag == "floor2":
            report(tag, stream_fn(n, args.tile, 2), 2, x)
        elif tag == "full":
            fn = M.polymul_mxu_fn(NAME, tile_b=args.tile)
            report(tag, fn, 3, x, y)
        elif tag == "compute_only" or tag.startswith("co_"):
            report(tag, compute_only_fn(NAME, args.tile, B, tag), 3,
                   x[:args.tile], y[:args.tile])
        else:
            report(tag, variant_fn(NAME, args.tile, tag), 3, x, y)


if __name__ == "__main__":
    main()
