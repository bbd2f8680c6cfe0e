"""Pallas TPU kernels for the reference's five explicit pipeline pairings.

The reference runs each NTT flavor as its own GPU kernel pipeline —
Stockham-Stockham (NTT.cu:2008-2094), GS-CT (NTT.cu:2097-2178), CT-CT
(NTT.cu:2181-2268), GS-GS (NTT.cu:2271-2356), CT-GS (NTT.cu:2358-2443) —
with explicit Phi/invPhi weighting passes and separate (sometimes fused)
bit-reversal kernels between the stages.  ntt.py carries the same five
pipelines as jnp/XLA stage chains; this module is their DEVICE-KERNEL
form: one fused Pallas pass per batch tile, the same single-load /
single-store HBM contract as the flagship fused kernel (ntt_pallas.py).

Everything the reference does with separate kernel launches happens
in-VMEM here:

- psi / psi^{-1}·n^{-1} weighting: one lazy Shoup row-multiply
  (reference Phi/invPhi kernels, NTT.cu:461-485).
- butterfly stages: the roll+select partner trick of ntt_pallas (lane j
  pairs with j XOR t at every distance t, for DIF and DIT alike), over
  full-width (L, n) cyclic twiddle tables.
- bit-reversal (reference NTT.cu:61-100, 487-509): decomposed into
  floor(L/2) disjoint bit-swap transpositions; a swap of index bits
  i < j is two static lane-rolls by +/-(2^j - 2^i) and a mask select —
  no gathers, every round is full-width VPU work.
- Stockham's self-sorting stage permutation (NTT.cu:1085-1199): the
  stage that maps tmp[t|c|r] -> out[c|t|r] is a one-step rotation of the
  index bit-field [st, L), realized as L-1-st adjacent bit-swaps.  The
  butterfly itself has a FIXED partner distance n/2 at every stage.

Lazy-arithmetic invariants (same discipline as ntt_pallas):
  DIF stages keep values in [0, 2q); DIT stages in [0, 4q) (inputs to a
  DIT chain must be < 4q; its lazy outputs feed mulmod_barrett, which is
  exact for any uint32).  The final invPhi row-multiply returns [0, 2q)
  and one csub canonicalizes.  All five kernels are bit-exact vs their
  XLA twins and the big-int oracle (tests/test_pairings_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmul import mulmod_barrett, shoup_mulmod_lazy
from .ntt_pallas import _csub, _iota_cols, _partners, _roll, _tile_b
from .tables import _shoup_arr, get_tables

__all__ = ["PAIRINGS", "polymul_pairing_fn"]

# pairing -> (forward scheme, inverse scheme); "dif" = decimation in
# frequency (GS butterfly, nat -> rev), "dit" = decimation in time (CT
# butterfly, rev -> nat), "stk" = Stockham autosort (nat -> nat).
PAIRINGS: dict[str, tuple[str, str]] = {
    "gs_ct": ("dif", "dit"),
    "ct_ct": ("dit", "dit"),
    "gs_gs": ("dif", "dif"),
    "ct_gs": ("dit", "dif"),
    "stockham": ("stk", "stk"),
}


# ----------------------------------------------------------------------
# Static lane permutations from roll+select bit swaps.
# ----------------------------------------------------------------------

def _bitswap(v, col, i: int, j: int):
    """out[p] = v[p with index bits i < j swapped]: lanes with exactly one
    of the two bits set exchange with their image at distance 2^j - 2^i."""
    d = (1 << j) - (1 << i)
    bi = (col & (1 << i)) != 0
    bj = (col & (1 << j)) != 0
    up = _roll(v, -d)                       # out[p] = v[p + d]
    dn = _roll(v, d)                        # out[p] = v[p - d]
    v = jnp.where(bi & jnp.logical_not(bj), up, v)
    return jnp.where(bj & jnp.logical_not(bi), dn, v)


def _bitrev_lanes(v, col, L: int):
    """out[p] = v[bitrev_L(p)] — floor(L/2) disjoint transpositions."""
    for i in range(L // 2):
        v = _bitswap(v, col, i, L - 1 - i)
    return v


def _stk_perm(v, col, st: int, L: int):
    """Stockham stage-st output shuffle: out[c|t|r] = tmp[t|c|r] with
    t = bit st of the OUTPUT index, c = bits st+1..L-1, r = bits 0..st-1;
    i.e. rotate the index bit-field [st, L) down by one.  Applying the
    adjacent swaps to the ARRAY in descending order composes to the
    index map sigma = tau(L-2,L-1) o ... o tau(st,st+1) (the first array
    op is the outermost index function)."""
    for b in range(L - 2, st - 1, -1):
        v = _bitswap(v, col, b, b + 1)
    return v


# ----------------------------------------------------------------------
# Butterfly stage chains over full-width (L, n) twiddle tables.
# ----------------------------------------------------------------------

def _dif_stages(v, col, tw_ref, twsh_ref, n: int, L: int, q: int):
    """Cyclic DIF (GS butterfly) chain, nat -> rev.  [0,2q) -> [0,2q):
    sum branch csubs to [0,2q); diff branch's lazy Shoup is exact for any
    uint32 and returns [0,2q)."""
    for s in range(L):
        t = n >> (s + 1)
        bit = (col & t) != 0
        uu, vv = _partners(v, bit, t)
        sm = _csub(uu + vv, 2 * q)
        d = shoup_mulmod_lazy(uu + np.uint32(2 * q) - vv,
                              tw_ref[s], twsh_ref[s], q)
        v = jnp.where(bit, d, sm)
    return v


def _dit_stages(v, col, tw_ref, twsh_ref, n: int, L: int, q: int):
    """Cyclic DIT (CT butterfly) chain, rev -> nat.  Input < 4q; keeps a
    [0,4q) invariant: hi = V*w lazily in [0,2q), U csubbed to [0,2q),
    out = U' + hi (sum lane) or U' + (2q - hi) (diff lane), both < 4q.
    Output is LAZY in [0,4q)."""
    for s in range(L):
        t = 1 << s
        bit = (col & t) != 0
        uu, vv = _partners(v, bit, t)
        hi = shoup_mulmod_lazy(vv, tw_ref[s], twsh_ref[s], q)
        u2 = _csub(uu, 2 * q)
        v = jnp.where(bit, u2 + (np.uint32(2 * q) - hi), u2 + hi)
    return v


def _stk_stages(v, col, tw_ref, twsh_ref, n: int, L: int, q: int):
    """Stockham autosort chain, nat -> nat, [0,2q) -> [0,2q).  Every
    stage's butterfly partner is at the FIXED distance n/2 (the (nc,
    stride) view's a/b halves are the lower/upper half of the flat
    lane axis); the stage twiddle varies along the lanes (full-width
    table) and the output shuffle is _stk_perm."""
    half = n // 2
    bit = (col & half) != 0
    for st in range(L):
        uu, vv = _partners(v, bit, half)
        sm = _csub(uu + vv, 2 * q)
        d = shoup_mulmod_lazy(uu + np.uint32(2 * q) - vv,
                              tw_ref[st], twsh_ref[st], q)
        v = jnp.where(bit, d, sm)
        v = _stk_perm(v, col, st, L)
    return v


_STAGE_OUT_ORDER = {"dif": "rev", "dit": "nat", "stk": "nat"}
_INV_IN_ORDER = {"dif": "nat", "dit": "rev", "stk": "nat"}


# ----------------------------------------------------------------------
# The one generic pairing kernel (pairing is a static Python arg).
# ----------------------------------------------------------------------

def _pairing_kernel(x_ref, y_ref, phi, phish, fw, fwsh, iv, ivsh,
                    iphi, iphish, z_ref, *, pairing: str, n: int, L: int,
                    q: int, r32, r32_sh, one_sh):
    fwd_kind, inv_kind = PAIRINGS[pairing]
    col = _iota_cols(x_ref.shape)

    def forward(v):
        v = shoup_mulmod_lazy(v, phi[:], phish[:], q)       # psi, [0,2q)
        if fwd_kind == "dif":
            return _dif_stages(v, col, fw, fwsh, n, L, q)
        if fwd_kind == "dit":
            # DIT consumes bit-reversed input (reference pre-reversal
            # kernels, NTT.cu:2196-2203)
            return _dit_stages(_bitrev_lanes(v, col, L), col,
                               fw, fwsh, n, L, q)
        return _stk_stages(v, col, fw, fwsh, n, L, q)

    X = forward(x_ref[:])
    Y = forward(y_ref[:])
    # exact for any uint32 inputs (DIT outputs are lazy < 4q); canonical out
    Z = mulmod_barrett(X, Y, q, r32, r32_sh, one_sh)
    if _STAGE_OUT_ORDER[fwd_kind] != _INV_IN_ORDER[inv_kind]:
        Z = _bitrev_lanes(Z, col, L)
    if inv_kind == "dit":
        v = _dit_stages(Z, col, iv, ivsh, n, L, q)          # -> nat
    elif inv_kind == "dif":
        v = _bitrev_lanes(_dif_stages(Z, col, iv, ivsh, n, L, q), col, L)
    else:
        v = _stk_stages(Z, col, iv, ivsh, n, L, q)
    # invPhi row carries n^{-1} (tables.py inv_phi); lazy then one csub
    v = shoup_mulmod_lazy(v, iphi[:], iphish[:], q)
    z_ref[:] = _csub(v, q)


# ----------------------------------------------------------------------
# Host-side table construction (exact ints, cached per param set).
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _pairing_tables(name: str):
    """Full-width (L, n) cyclic twiddle rows for each scheme + the phi /
    invPhi weighting rows, with Shoup companions.  Lane law: a stage with
    half-width h holds w^((j mod h) * n/(2h)) at lane j — identical at
    both partner slots, so the kernels never mask the table."""
    tbl = get_tables(name)
    ps, n, L, q = tbl.ps, tbl.n, tbl.logn, tbl.q
    tf = ps.omega_powers(n).astype(object)
    ti = ps.omega_powers(n, inverse=True).astype(object)
    j = np.arange(n)

    def full(roots, hs):
        out = np.empty((L, n), dtype=np.uint32)
        for s, h in enumerate(hs):
            stride = n // (2 * h)
            out[s] = roots[(j % h) * stride].astype(np.uint32)
        return out

    def stk(roots):
        out = np.empty((L, n), dtype=np.uint32)
        for st in range(L):
            stride = 1 << st
            out[st] = roots[((j % (n // 2)) // stride) * stride].astype(
                np.uint32)
        return out

    dif_hs = [n >> (s + 1) for s in range(L)]
    dit_hs = [1 << s for s in range(L)]
    fam = {
        "dif": (full(tf, dif_hs), full(ti, dif_hs)),
        "dit": (full(tf, dit_hs), full(ti, dit_hs)),
        "stk": (stk(tf), stk(ti)),
    }
    fam = {k: (f, _shoup_arr(f, q), i, _shoup_arr(i, q))
           for k, (f, i) in fam.items()}
    phi = tbl.phi.reshape(1, n)
    iphi = tbl.inv_phi.reshape(1, n)        # includes n^{-1}
    return fam, (phi, _shoup_arr(phi, q), iphi, _shoup_arr(iphi, q))


def _build(kernel, n: int, tables, tile_b: int, interpret: bool):
    """Batch-tiled pallas_call runner for 2 (B, n) tensor inputs plus
    constant tables of arbitrary shapes (same tiling/padding policy as
    ntt_pallas._call)."""
    tables = tuple(jnp.asarray(t) for t in tables)

    def run(x, y):
        shape = x.shape
        x = x.reshape(-1, n)
        y = y.reshape(-1, n)
        B = x.shape[0]
        tile = min(tile_b, max(8, 1 << (B - 1).bit_length()))
        pad = (-B) % tile
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
            y = jnp.pad(y, ((0, pad), (0, 0)))
        Bp = B + pad
        tens_specs = [pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] * 2
        tab_specs = [pl.BlockSpec(t.shape, lambda i, nd=t.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM) for t in tables]
        out = pl.pallas_call(
            kernel,
            grid=(Bp // tile,),
            in_specs=tens_specs + tab_specs,
            out_specs=pl.BlockSpec((tile, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.uint32),
            interpret=interpret,
        )(x, y, *tables)
        out = out[:B] if pad else out
        return out.reshape(shape)

    return run


@functools.lru_cache(maxsize=None)
def polymul_pairing_fn(name: str, pairing: str, tile_b: int | None = None,
                       interpret: bool = False):
    """Jitted fused negacyclic polymul for one explicit pipeline pairing:
    (B, n) x (B, n) -> (B, n), canonical residues."""
    if pairing not in PAIRINGS:
        raise ValueError(
            f"unknown pairing {pairing!r}; choose from {sorted(PAIRINGS)}")
    tbl = get_tables(name)
    ps = tbl.ps
    fam, (phi, phish, iphi, iphish) = _pairing_tables(name)
    fwd_kind, inv_kind = PAIRINGS[pairing]
    fw, fwsh = fam[fwd_kind][0], fam[fwd_kind][1]
    iv, ivsh = fam[inv_kind][2], fam[inv_kind][3]
    kernel = functools.partial(
        _pairing_kernel, pairing=pairing, n=tbl.n, L=tbl.logn, q=tbl.q,
        r32=ps.r32, r32_sh=ps.r32_shoup, one_sh=ps.one_shoup)
    run = _build(kernel, tbl.n,
                 (phi, phish, fw, fwsh, iv, ivsh, iphi, iphish),
                 _tile_b(tbl.n, tile_b), interpret)

    def fn(x, y):
        return run(jnp.asarray(x, jnp.uint32), jnp.asarray(y, jnp.uint32))

    return jax.jit(fn)
