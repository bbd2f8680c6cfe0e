"""Fused Pallas TPU kernels: the entire negacyclic polymul (two forward
NTTs, pointwise multiply, inverse NTT) in ONE kernel pass per batch tile.

The reference pays 20+ kernel launches + PCIe copies per polymul
(NTT.cu:2034-2081: one launch per butterfly stage, global memory between
stages); here a (TILE_B, n) tile is loaded into VMEM once, all 3*log2(n)
butterfly stages + weighting + pointwise run on-chip, and z is written once —
HBM traffic is exactly read x,y / write z (SURVEY.md §7 "hard parts" #5).

Butterfly data movement without gathers (hard part #2): a radix-2 stage at
distance t pairs lane j with lane j XOR t.  Both partners are materialized
with two lane-rolls of the (TILE_B, n) tile and selected with an iota mask,
so every stage is full-width VPU work with no reshapes that would cross the
8x128 tiling.  Twiddles come from precomputed full-width (L, n) tables
(tables.py ct_fwd_full / gs_inv_full) with psi and n^{-1} merged in — the
fused-weighting trick the reference only applies in its best variants
(NTT.cu:1099-1101, 1429-1432) is structural here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmul import mulmod_barrett, shoup_mulmod_lazy
from .tables import NttTables, get_tables

__all__ = ["polymul_fused_fn", "polymul_fixed_fused_fn", "ntt_fused_fn",
           "intt_fused_fn"]


def _roll(v, shift: int):
    """Static circular shift along the lane (last) axis, jnp.roll
    convention: out[j] = v[j - shift]  (pltpu.roll requires shift >= 0)."""
    return pltpu.roll(v, shift=shift % v.shape[1], axis=1)


def _partners(v, bit, t: int):
    """(U, V) at every lane: U = value at the bit-clear slot of the pair,
    V = value at the bit-set slot; partner of lane j is j XOR t."""
    vv = jnp.where(bit, v, _roll(v, -t))
    uu = jnp.where(bit, _roll(v, t), v)
    return uu, vv


def _csub(v, bound: int):
    b = np.uint32(bound)
    return jnp.where(v >= b, v - b, v)


def _fwd_stages(v, col, ftw_ref, ftw_sh_ref, n: int, L: int, q: int):
    """Merged-psi CT forward, Harvey-lazy with signed twiddles.

    Tables are ct_fwd_full_signed: bit-set lanes hold q - S, making the
    butterfly a single unconditional  out = csub_{2q}(U) + shoup_lazy(V, S')
    (U - V*S == U + V*(q - S) mod q).  Invariant: values in [0, 4q);
    shoup_lazy is exact for ANY uint32 input, so V needs no pre-reduction.
    Output is LAZY in [0, 4q)."""
    for s in range(L):
        t = n >> (s + 1)
        bit = (col & t) != 0
        uu, vv = _partners(v, bit, t)
        hi = shoup_mulmod_lazy(vv, ftw_ref[s], ftw_sh_ref[s], q)  # [0, 2q)
        v = _csub(uu, 2 * q) + hi                                  # [0, 4q)
    return v


def _inv_stages(v, col, itw_ref, itw_sh_ref, n: int, L: int, q: int):
    """Merged-psi GS inverse, Harvey-lazy: stage s has pair distance
    t = 1 << s; out0 = csub_{2q}(U+V), out1 = shoup_lazy(U-V+2q, S); the
    last stage multiplies BOTH branches (gs_inv_full's last row carries
    n^{-1} / psi_rev^{-1}[1]*n^{-1}) and canonicalizes.

    Accepts inputs in [0, 2q); returns CANONICAL [0, q)."""
    for s in range(L):
        t = 1 << s
        bit = (col & t) != 0
        uu, vv = _partners(v, bit, t)
        d = uu - vv + np.uint32(2 * q)          # (0, 4q), wrap-corrected
        if s < L - 1:
            su = _csub(uu + vv, 2 * q)          # [0, 2q)
            hi = shoup_mulmod_lazy(d, itw_ref[s], itw_sh_ref[s], q)
            v = jnp.where(bit, hi, su)          # [0, 2q)
        else:
            v = shoup_mulmod_lazy(jnp.where(bit, d, uu + vv),
                                  itw_ref[s], itw_sh_ref[s], q)
            v = _csub(v, q)                     # canonical
    return v


def _iota_cols(shape):
    return jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)


def _polymul_kernel(x_ref, y_ref, ftw, ftw_sh, itw, itw_sh, z_ref, *,
                    n, L, q, r32, r32_sh, one_sh):
    col = _iota_cols(x_ref.shape)
    # forward outputs are lazy [0, 4q); mulmod_barrett's 64-bit assembly is
    # exact for any uint32 operands, so the pointwise needs no pre-reduce and
    # yields canonical values for the inverse
    X = _fwd_stages(x_ref[:], col, ftw, ftw_sh, n, L, q)
    Y = _fwd_stages(y_ref[:], col, ftw, ftw_sh, n, L, q)
    Z = mulmod_barrett(X, Y, q, r32, r32_sh, one_sh)
    z_ref[:] = _inv_stages(Z, col, itw, itw_sh, n, L, q)


def _polymul_fixed_kernel(x_ref, yspec_ref, ftw, ftw_sh, itw, itw_sh, z_ref,
                          *, n, L, q, r32, r32_sh, one_sh):
    """Fixed-operand pipeline: one forward transform + pointwise against a
    precomputed broadcast spectrum + inverse — the qTESLA-verification
    serving shape, one fused kernel, only x and z streamed."""
    col = _iota_cols(x_ref.shape)
    X = _fwd_stages(x_ref[:], col, ftw, ftw_sh, n, L, q)
    Z = mulmod_barrett(X, yspec_ref[:], q, r32, r32_sh, one_sh)
    z_ref[:] = _inv_stages(Z, col, itw, itw_sh, n, L, q)


def _ntt_kernel(x_ref, ftw, ftw_sh, out_ref, *, n, L, q):
    col = _iota_cols(x_ref.shape)
    v = _fwd_stages(x_ref[:], col, ftw, ftw_sh, n, L, q)
    out_ref[:] = _csub(_csub(v, 2 * q), q)      # lazy [0,4q) -> canonical


def _intt_kernel(x_ref, itw, itw_sh, out_ref, *, n, L, q):
    col = _iota_cols(x_ref.shape)
    out_ref[:] = _inv_stages(x_ref[:], col, itw, itw_sh, n, L, q)


def _tile_b(n: int, requested: int | None) -> int:
    if requested:
        return requested
    # ~14 live (tile_b, n) u32 buffers fit in 16 MB VMEM; tile_b=128 measured
    # fastest for n=1024 (tile sweep 64/128/256, 2026-08)
    return max(8, min(128, (1024 * 1024) // (4 * n)))


def _call(kernel, tbl: NttTables, num_tensor_in: int, tables, tile_b: int,
          interpret: bool, num_bcast_in: int = 0):
    """Build a runner for `num_tensor_in` (B, n) tensor inputs, then
    `num_bcast_in` (1, n) rows broadcast to every tile (fixed-operand
    spectra), plus the given (L, n) table inputs, tiled over the batch with
    padding."""
    n, L = tbl.n, tbl.logn
    tables = tuple(jnp.asarray(t) for t in tables)

    def run(*tensors):
        bcast = tuple(v.reshape(1, n) for v in tensors[num_tensor_in:])
        tensors = tensors[:num_tensor_in]
        shape = tensors[0].shape
        tensors = tuple(v.reshape(-1, n) for v in tensors)
        B = tensors[0].shape[0]
        # small batches use a smaller tile instead of padding up to the
        # full one (mirrors ntt_mxu._make_runner)
        tile = min(tile_b, max(8, 1 << (B - 1).bit_length()))
        pad = (-B) % tile
        if pad:
            tensors = tuple(jnp.pad(v, ((0, pad), (0, 0))) for v in tensors)
        Bp = B + pad
        tens_specs = [pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(num_tensor_in)]
        tens_specs += [pl.BlockSpec((1, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(len(bcast))]
        tab_specs = [pl.BlockSpec((L, n), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
                     for _ in range(len(tables))]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // tile,),
            in_specs=tens_specs + tab_specs,
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.uint32),
            interpret=interpret,
        )(*tensors, *bcast, *tables)
        out = out[:B] if pad else out
        return out.reshape(shape)

    return run


@functools.lru_cache(maxsize=None)
def polymul_fused_fn(name: str, tile_b: int | None = None,
                     interpret: bool = False):
    """Jitted fused negacyclic polymul: (B, n) x (B, n) -> (B, n)."""
    tbl = get_tables(name)
    ps = tbl.ps
    kernel = functools.partial(
        _polymul_kernel, n=tbl.n, L=tbl.logn, q=tbl.q,
        r32=ps.r32, r32_sh=ps.r32_shoup, one_sh=ps.one_shoup)
    run = _call(kernel, tbl, 2,
                (tbl.ct_fwd_full_signed, tbl.ct_fwd_full_signed_shoup,
                 tbl.gs_inv_full, tbl.gs_inv_full_shoup),
                _tile_b(tbl.n, tile_b), interpret)

    def fn(x, y):
        return run(jnp.asarray(x, jnp.uint32), jnp.asarray(y, jnp.uint32))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def polymul_fixed_fused_fn(name: str, tile_b: int | None = None,
                           interpret: bool = False):
    """Jitted fixed-operand fused polymul: (B, n) x spectrum (n,) -> (B, n).
    The measured tiny-batch latency winner (no digit tables to stage);
    spectrum convention identical to polymul_fixed_mxu_fn (canonical
    merged-order forward NTT of the constant operand)."""
    tbl = get_tables(name)
    ps = tbl.ps
    n = tbl.n
    kernel = functools.partial(
        _polymul_fixed_kernel, n=n, L=tbl.logn, q=tbl.q,
        r32=ps.r32, r32_sh=ps.r32_shoup, one_sh=ps.one_shoup)
    run = _call(kernel, tbl, 1,
                (tbl.ct_fwd_full_signed, tbl.ct_fwd_full_signed_shoup,
                 tbl.gs_inv_full, tbl.gs_inv_full_shoup),
                _tile_b(n, tile_b), interpret, num_bcast_in=1)

    def fn(x, yspec):
        x = jnp.asarray(x, jnp.uint32)
        return run(x, jnp.asarray(yspec, jnp.uint32))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def ntt_fused_fn(name: str, tile_b: int | None = None,
                 interpret: bool = False):
    """Jitted fused merged-psi forward NTT (nat -> rev), one kernel pass."""
    tbl = get_tables(name)
    kernel = functools.partial(_ntt_kernel, n=tbl.n, L=tbl.logn, q=tbl.q)
    run = _call(kernel, tbl, 1,
                (tbl.ct_fwd_full_signed, tbl.ct_fwd_full_signed_shoup),
                _tile_b(tbl.n, tile_b), interpret)
    return jax.jit(lambda x: run(jnp.asarray(x, jnp.uint32)))


@functools.lru_cache(maxsize=None)
def intt_fused_fn(name: str, tile_b: int | None = None,
                  interpret: bool = False):
    """Jitted fused merged-psi inverse NTT (rev -> nat), one kernel pass."""
    tbl = get_tables(name)
    kernel = functools.partial(_intt_kernel, n=tbl.n, L=tbl.logn, q=tbl.q)
    run = _call(kernel, tbl, 1, (tbl.gs_inv_full, tbl.gs_inv_full_shoup),
                _tile_b(tbl.n, tile_b), interpret)
    return jax.jit(lambda x: run(jnp.asarray(x, jnp.uint32)))
