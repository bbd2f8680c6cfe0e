"""Negacyclic polynomial-multiplication pipelines (the framework's "model
families").

Each algorithm is a full pipeline z = x * y mod (X^n + 1) mod q, batched over
leading axes, assembled from the ops layer — the TPU successor of the
reference's test_NTT_*_nega_gpu pipelines (NTT.cu:2008-2443: Stockham,
GS-CT, CT-CT, GS-GS, CT-GS) plus the merged-psi flagship and the
Nussbaumer / naive-oracle alternatives.

The reference pays ~20 kernel launches + PCIe per polymul; here each pipeline
is a single jitted XLA program (and `fused` is a single Pallas kernel).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import ntt as N
from ..ops.tables import NttTables, get_tables
from ..params import ParamSet


def _tables(ps) -> NttTables:
    if isinstance(ps, str):
        return get_tables(ps)
    if isinstance(ps, ParamSet):
        return get_tables(ps.name)
    if isinstance(ps, NttTables):
        return ps
    raise TypeError(f"expected param-set name/ParamSet/NttTables, got {ps!r}")


# ----------------------------------------------------------------------
# Public transform API (flagship merged-psi pair).
# ----------------------------------------------------------------------

def ntt(x, ps, algo: str = "merged"):
    """Forward negacyclic NTT. 'merged': nat -> rev, psi in twiddles;
    'fused'/'mxu' are the Pallas kernels with identical output order."""
    tbl = _tables(ps)
    if algo == "merged":
        return N.ntt_fwd_merged(x, tbl)
    if algo == "stockham":
        return N.stockham_fwd(N.weight_psi(x, tbl), tbl)
    if algo == "fused":
        from ..ops.ntt_pallas import ntt_fused_fn
        return ntt_fused_fn(tbl.ps.name)(x)
    if algo == "mxu":
        from ..ops.ntt_mxu import ntt_mxu_fn
        return ntt_mxu_fn(tbl.ps.name)(x)
    raise ValueError(f"unknown ntt algo {algo!r}")


def intt(X, ps, algo: str = "merged"):
    """Inverse negacyclic NTT (matching `ntt`'s output order)."""
    tbl = _tables(ps)
    if algo == "merged":
        return N.intt_inv_merged(X, tbl)
    if algo == "stockham":
        return N.weight_ipsi_ninv(N.stockham_inv(X, tbl, scale_ninv=False),
                                  tbl)
    if algo == "fused":
        from ..ops.ntt_pallas import intt_fused_fn
        return intt_fused_fn(tbl.ps.name)(X)
    if algo == "mxu":
        from ..ops.ntt_mxu import intt_mxu_fn
        return intt_mxu_fn(tbl.ps.name)(X)
    raise ValueError(f"unknown intt algo {algo!r}")


# ----------------------------------------------------------------------
# Pipelines.  All: (B..., n) x (B..., n) -> (B..., n), canonical residues.
# ----------------------------------------------------------------------

def _pm_merged(x, y, tbl):
    """Flagship: merged-psi CT fwd + GS inv; reversal-free, no separate
    weighting passes (strictly fewer ops than the reference's headline
    GS->CT pipeline, NTT.cu:2097-2178)."""
    X = N.ntt_fwd_merged(x, tbl)
    Y = N.ntt_fwd_merged(y, tbl)
    return N.intt_inv_merged(N.pointwise_mul(X, Y, tbl), tbl)


def _pm_gs_ct(x, y, tbl):
    """Reference headline pairing (NTT.cu:2097-2178): cyclic GS (DIF) fwd
    [nat->rev] + cyclic CT (DIT) inv [rev->nat] — bit-reversals cancel;
    explicit psi weighting around the cyclic transforms."""
    X = N.gs_fwd_cyclic(N.weight_psi(x, tbl), tbl)
    Y = N.gs_fwd_cyclic(N.weight_psi(y, tbl), tbl)
    Z = N.pointwise_mul(X, Y, tbl)
    return N.weight_ipsi_ninv(N.ct_inv_cyclic(Z, tbl, scale_ninv=False), tbl)


def _pm_ct_ct(x, y, tbl):
    """CT fwd + CT inv (reference NTT.cu:2181-2268): DIT needs rev input,
    so both directions pay an explicit bit-reversal gather."""
    X = N.ct_fwd_cyclic(N.bitrev_permute(N.weight_psi(x, tbl), tbl), tbl)
    Y = N.ct_fwd_cyclic(N.bitrev_permute(N.weight_psi(y, tbl), tbl), tbl)
    Z = N.bitrev_permute(N.pointwise_mul(X, Y, tbl), tbl)
    return N.weight_ipsi_ninv(N.ct_inv_cyclic(Z, tbl, scale_ninv=False), tbl)


def _pm_gs_gs(x, y, tbl):
    """GS fwd + GS inv (reference NTT.cu:2271-2356): DIF outputs rev and
    consumes nat, so the spectral domain pays one bit-reversal."""
    X = N.gs_fwd_cyclic(N.weight_psi(x, tbl), tbl)
    Y = N.gs_fwd_cyclic(N.weight_psi(y, tbl), tbl)
    Z = N.bitrev_permute(N.pointwise_mul(X, Y, tbl), tbl)
    z = N.bitrev_permute(N.gs_inv_cyclic(Z, tbl, scale_ninv=False), tbl)
    return N.weight_ipsi_ninv(z, tbl)


def _pm_ct_gs(x, y, tbl):
    """CT fwd + GS inv (reference NTT.cu:2358-2443)."""
    X = N.ct_fwd_cyclic(N.bitrev_permute(N.weight_psi(x, tbl), tbl), tbl)
    Y = N.ct_fwd_cyclic(N.bitrev_permute(N.weight_psi(y, tbl), tbl), tbl)
    Z = N.pointwise_mul(X, Y, tbl)                       # natural order
    z = N.bitrev_permute(N.gs_inv_cyclic(Z, tbl, scale_ninv=False), tbl)
    return N.weight_ipsi_ninv(z, tbl)


def _pm_stockham(x, y, tbl):
    """Stockham fwd/inv (reference NTT.cu:2008-2094): self-sorting, no
    bit-reversal anywhere; psi weighting fused by XLA into the stage chain
    (the reference fuses it into the first/last kernels, NTT.cu:1099-1101,
    1335-1336)."""
    X = N.stockham_fwd(N.weight_psi(x, tbl), tbl)
    Y = N.stockham_fwd(N.weight_psi(y, tbl), tbl)
    Z = N.pointwise_mul(X, Y, tbl)
    return N.weight_ipsi_ninv(N.stockham_inv(Z, tbl, scale_ninv=False), tbl)


def _pm_fourstep(x, y, tbl, n1: int | None = None):
    """Four-step N=N1xN2 pipeline (reference NTT.cu:667-951) — the
    decomposition that becomes the multi-chip SP axis (parallel/)."""
    if n1 is None:
        n1 = 1 << (tbl.logn // 2)   # balanced split (reference fixes N1=32)
    X = N.fourstep_ntt(N.weight_psi(x, tbl), tbl, n1=n1)
    Y = N.fourstep_ntt(N.weight_psi(y, tbl), tbl, n1=n1)
    Z = N.pointwise_mul(X, Y, tbl)
    # fourstep_intt's sub-inverses already contribute n^{-1}; weight by
    # psi^{-i} only
    return N.weight_ipsi(N.fourstep_intt(Z, tbl, n1=n1), tbl)


def _pm_matrix(x, y, tbl):
    """Dense precomputed-matrix NTT pipeline (reference NTT.cu:560-659)."""
    X = N.matrix_ntt(N.weight_psi(x, tbl), tbl)
    Y = N.matrix_ntt(N.weight_psi(y, tbl), tbl)
    Z = N.pointwise_mul(X, Y, tbl)
    # matrix_ntt(inverse=True) already applies n^{-1}
    return N.weight_ipsi(N.matrix_ntt(Z, tbl, inverse=True), tbl)


ALGORITHMS: dict[str, Callable] = {
    "merged": _pm_merged,
    "gs_ct": _pm_gs_ct,
    "ct_ct": _pm_ct_ct,
    "gs_gs": _pm_gs_gs,
    "ct_gs": _pm_ct_gs,
    "stockham": _pm_stockham,
    "four_step": _pm_fourstep,
    "matrix": _pm_matrix,
}


@functools.lru_cache(maxsize=None)
def polymul_fn(name: str, algo: str = "merged"):
    """A jitted (x, y) -> z negacyclic polymul for one param set + algorithm.
    Tables are closed over and baked into the executable as constants."""
    tbl = get_tables(name)
    try:
        pipeline = ALGORITHMS[algo]
    except KeyError:
        if algo == "fused":
            from ..ops.ntt_pallas import polymul_fused_fn
            return polymul_fused_fn(name)
        if algo.endswith("_kernel"):
            # device-kernel form of an explicit pipeline pairing
            # (reference NTT.cu:2008-2443); bit-exact vs the XLA twin
            from ..ops.ntt_pairings_pallas import (PAIRINGS,
                                                   polymul_pairing_fn)
            pairing = algo[:-len("_kernel")]
            if pairing in PAIRINGS:
                return polymul_pairing_fn(name, pairing)
        if algo == "mxu":
            from ..ops.ntt_mxu import polymul_mxu_fn
            return polymul_mxu_fn(name)
        if algo == "nussbaumer":
            # the exact mod-q recursion: valid for ALL operands.  The
            # reference-shaped Z_{2^32-1} ring path (domain-restricted,
            # guarded) stays available as ops.nussbaumer.
            # polymul_nussbaumer_fn(name, max_coeff=...).
            from ..ops.nussbaumer import polymul_nussbaumer_q_fn
            return polymul_nussbaumer_q_fn(name)
        from ..ops.ntt_pairings_pallas import PAIRINGS
        raise ValueError(
            f"unknown algorithm {algo!r}; available: "
            f"{sorted(ALGORITHMS) + ['fused', 'mxu', 'nussbaumer'] + [p + '_kernel' for p in sorted(PAIRINGS)]}"
        ) from None
    return jax.jit(functools.partial(pipeline, tbl=tbl))


@functools.lru_cache(maxsize=None)
def polymul_fixed_fn(name: str, algo: str = "mxu"):
    """(prepare, multiply) pair for fixed-operand products z = x * a with a
    constant polynomial a (the qTESLA verification shape: a is the public
    polynomial).  prepare(a) -> A (run once); multiply(x, A) -> (B, n)
    products, costing one forward + one inverse transform each (the
    streamed-both-operands pipelines pay two forwards).  For 'mxu'/'fused'/
    'merged', A is the spectrum; for 'mxu-folded' (fastest), A is the
    (W', const') folded inverse-table pair — the constant's pointwise
    diagonal baked into the inverse matmul, deleting the pointwise stage
    (measured +6-13% over 'mxu' on v5e, docs/BENCHMARKS.md)."""
    tbl = get_tables(name)
    if algo == "mxu":
        from ..ops.ntt_mxu import ntt_mxu_fn, polymul_fixed_mxu_fn
        return ntt_mxu_fn(name), polymul_fixed_mxu_fn(name)
    if algo == "mxu-folded":
        # the constant's pointwise diagonal folded into the inverse matmul
        # tables (ntt_mxu.fixed_fold_plan): prepare() returns (W', const')
        # instead of a spectrum, and multiply() runs fwd -> inv with NO
        # pointwise stage.  prepare is a host-side exact-int construction
        # (run once per constant); every constant shares one compiled
        # kernel.
        import numpy as _np

        from ..ops.ntt_mxu import (fixed_fold_tables, ntt_mxu_fn,
                                   polymul_fixed_folded_mxu_fn)
        fwd = ntt_mxu_fn(name)
        mulk = polymul_fixed_folded_mxu_fn(name)

        def prep(a):
            a = jnp.asarray(a, jnp.uint32).reshape(1, -1)
            return fixed_fold_tables(name, _np.asarray(fwd(a))[0])

        def mul(x, A):
            return mulk(x, *A)

        return prep, mul
    if algo == "fused":
        from ..ops.ntt_pallas import ntt_fused_fn, polymul_fixed_fused_fn
        return ntt_fused_fn(name), polymul_fixed_fused_fn(name)
    if algo == "merged":
        prep = jax.jit(functools.partial(N.ntt_fwd_merged, tbl=tbl))

        def mul(x, A):
            X = N.ntt_fwd_merged(x, tbl)
            return N.intt_inv_merged(N.pointwise_mul(X, A, tbl), tbl)

        return prep, jax.jit(mul)
    raise ValueError(f"unknown fixed-operand algo {algo!r}")


def polymul_negacyclic(x, y, ps, algo: str = "merged"):
    """z = x*y mod (X^n + 1) mod q, batched over leading axes."""
    tbl = _tables(ps)
    x = jnp.asarray(x, dtype=jnp.uint32)
    y = jnp.asarray(y, dtype=jnp.uint32)
    if x.shape[-1] != tbl.n or y.shape[-1] != tbl.n:
        raise ValueError(
            f"last axis must be n={tbl.n} for {tbl.ps.name}; got "
            f"x{x.shape}, y{y.shape}")
    return polymul_fn(tbl.ps.name, algo)(x, y)
