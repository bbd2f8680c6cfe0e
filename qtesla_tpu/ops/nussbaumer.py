"""Batched Nussbaumer negacyclic convolution over Z_{2^32-1}.

NTT-free alternative path (reference nussbaumer_fft, NTT.cu:147-277) used to
cross-check the NTT pipelines.  The reference's pointer-chasing recursion over
malloc'd row arrays is restructured as fixed-shape tensor ops (SURVEY.md §7
step 6): the state is a (..., 2m, r) array; each butterfly level is a static
row permutation + a per-row negacyclic shift realized as one static gather +
sign mask; the 2m base multiplications are schoolbook negacyclic r-point
products vectorized over all rows and batch lanes.

Math: to multiply in Z[X]/(X^n + 1) with n = m * r (m <= r, both powers of
two), write x as m polynomials X_i(w) of length r (X_i[j] = x[j*m + i]),
duplicate to 2m rows, run a 2m-point DFT over Z[w]/(w^r + 1) where the
2m-th root of unity is the *monomial* w^(r/m) — multiplication by it is a
negacyclic shift, no multiplies.  Pointwise negacyclic r-products, inverse
butterflies with exact halving (2 is invertible mod 2^32-1), recombine:
z[m*j + i] = Z_i[j] + Z_{m+i}[j-1] (negacyclic wrap at j=0).

Arithmetic is exact in Z_{2^32-1} whenever the true integer coefficients of
the product are < 2^32-1 in magnitude — the reference has the same domain
restriction (qTESLA's sparse/small multiplicands; SURVEY.md C19 note).
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
import numpy as np

from .modmul import mulmod_barrett, reduce_u32, u32
from .ringz32 import (RING_MOD, ring_add, ring_div2, ring_mul, ring_neg,
                      ring_normalize, ring_sub)

__all__ = ["nussbaumer_negacyclic_ring", "nussbaumer_negacyclic_modq",
           "polymul_nussbaumer_fn", "polymul_nussbaumer_q_fn",
           "nussbaumer_plan", "ring_exact_coeff_bound"]


# ----------------------------------------------------------------------
# Coefficient arithmetic hooks.  The butterfly/base-product machinery below
# is generic over the coefficient ring: Z_{2^32-1} (the reference's exact
# integer ring, NTT.cu:102-145) or Z_q directly (exact for ALL operands —
# the guard-free variant the reference lacks).
# ----------------------------------------------------------------------

_RING_ARITH = types.SimpleNamespace(
    add=ring_add, sub=ring_sub, neg=ring_neg, mul=ring_mul,
    div2=lambda v: ring_div2(ring_normalize(v)),
)


def _modq_arith(q: int, r32: int, r32_shoup: int, one_shoup: int):
    """Z_q arithmetic for the Nussbaumer recursion (q odd, < 2^31): the
    monomial-shift negations become q - x, halving uses the odd-modulus
    trick (x + q*(x&1)) >> 1, base products are full Barrett mulmods."""
    qv = jnp.uint32(q)

    def add(a, b):
        s = a + b
        return jnp.where(s >= qv, s - qv, s)

    def sub(a, b):
        d = a - b
        return jnp.where(a >= b, d, d + qv)

    def neg(a):
        return jnp.where(a == 0, a, qv - a)

    def div2(a):
        return jnp.where((a & 1) != 0, (a + qv) >> 1, a >> 1)

    def mul(a, b):
        return mulmod_barrett(a, b, q, r32, r32_shoup, one_shoup)

    return types.SimpleNamespace(add=add, sub=sub, neg=neg, mul=mul,
                                 div2=div2)


def _bitrev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


@functools.lru_cache(maxsize=None)
def nussbaumer_plan(n: int):
    """Static plan: (m, r), per-level row pairings and shift amounts, and the
    gather/sign tables that realize each negacyclic w-shift."""
    logn = n.bit_length() - 1
    logm = logn // 2
    m = 1 << logm
    r = n // m
    assert m * r == n and m <= r
    unit = r // m                       # w^(r/m) is the 2m-th root
    levels = []
    for j in range(logm - 1, -1, -1):
        idx_i, idx_l, shifts = [], [], []
        for i in range(1 << (logm - j)):
            sr = (_bitrev(i, logm - j) << j) * unit
            for t in range(1 << j):
                s = i << (j + 1)
                idx_i.append(s + t)
                idx_l.append(s + t + (1 << j))
                shifts.append(sr)
        levels.append((np.array(idx_i, np.int32), np.array(idx_l, np.int32),
                       np.array(shifts, np.int32)))

    def shift_tables(shifts):
        """For per-row negacyclic left-multiplication by w^s:
        out[a] = in[a-s] for a >= s, -in[r + a - s] for a < s."""
        a = np.arange(r)[None, :]
        s = shifts[:, None]
        gather = (a - s) % r
        negmask = a < s
        return gather.astype(np.int32), negmask

    fwd = []
    for idx_i, idx_l, shifts in levels:
        g, neg = shift_tables(shifts)
        perm = np.concatenate([idx_i, idx_l])
        inv_perm = np.argsort(perm).astype(np.int32)
        fwd.append((perm.astype(np.int32), inv_perm, g, neg))

    # inverse has logm+1 levels: j = 0..logm; the j = logm level (pair
    # distance m, shift 0) undoes the duplication the forward started from
    inv_levels = [levels[logm - 1 - j] for j in range(logm)]
    top = np.arange(m, dtype=np.int32)
    inv_levels.append((top, top + m, np.zeros(m, np.int32)))

    inv = []
    for idx_i, idx_l, shifts in inv_levels:
        # inverse level applies w^{-s}: out[a] = in[a+s] for a < r-s,
        # -in[a - (r-s)] for a >= r-s
        a = np.arange(r)[None, :]
        s = shifts[:, None]
        gather = ((a + s) % r).astype(np.int32)
        negmask = a >= (r - s)
        perm = np.concatenate([idx_i, idx_l])
        inv_perm = np.argsort(perm).astype(np.int32)
        inv.append((perm.astype(np.int32), inv_perm, gather, negmask))

    return m, r, fwd, inv


def _apply_shift(rows, gather, negmask, A):
    """rows: (..., P, r); per-row negacyclic monomial shift."""
    g = jnp.asarray(gather)
    shifted = jnp.take_along_axis(
        rows, jnp.broadcast_to(g, rows.shape), axis=-1)
    return jnp.where(jnp.asarray(negmask), A.neg(shifted), shifted)


def _forward(state, fwd, A):
    """state: (..., 2m, r) -> transformed, via static row-permute butterflies."""
    for perm, inv_perm, gather, negmask in fwd:
        v = jnp.take(state, jnp.asarray(perm), axis=-2)
        p = v.shape[-2] // 2
        a = v[..., :p, :]
        b = _apply_shift(v[..., p:, :], gather, negmask, A)
        out = jnp.concatenate([A.add(a, b), A.sub(a, b)], axis=-2)
        state = jnp.take(out, jnp.asarray(inv_perm), axis=-2)
    return state


def _inverse(state, inv, A):
    for perm, inv_perm, gather, negmask in inv:
        v = jnp.take(state, jnp.asarray(perm), axis=-2)
        p = v.shape[-2] // 2
        a = v[..., :p, :]
        b = v[..., p:, :]
        s = A.div2(A.add(a, b))
        d = A.div2(A.sub(a, b))
        d = _apply_shift(d, gather, negmask, A)
        out = jnp.concatenate([s, d], axis=-2)
        state = jnp.take(out, jnp.asarray(inv_perm), axis=-2)
    return state


def _base_negacyclic(x, y, r: int, A):
    """Schoolbook negacyclic r-point products, vectorized over (..., 2m) rows:
    z[..., i] = sum_j s(i,j) * x[..., j] * y[..., (i-j) mod r], statically
    unrolled over j (replaces the reference's `naive`, NTT.cu:147-165)."""
    acc = None
    for j in range(r):
        yr = jnp.roll(y, j, axis=-1)
        if j > 0:
            mask = np.zeros((r,), dtype=bool)
            mask[:j] = True            # wrapped positions i < j get negated
            yr = jnp.where(jnp.asarray(mask), A.neg(yr), yr)
        term = A.mul(x[..., j:j + 1], yr)
        acc = term if acc is None else A.add(acc, term)
    return acc


def _nussbaumer(x, y, A):
    """Generic negacyclic product over the coefficient arithmetic A."""
    n = x.shape[-1]
    m, r, fwd, inv = nussbaumer_plan(n)
    batch = x.shape[:-1]

    def lift(v):
        # X_i[j] = v[j*m + i]: (..., r, m) -> (..., m, r), duplicated to 2m
        vm = v.reshape(*batch, r, m)
        vm = jnp.swapaxes(vm, -1, -2)
        return jnp.concatenate([vm, vm], axis=-2)

    X = _forward(lift(x), fwd, A)
    Y = _forward(lift(y), fwd, A)
    Z = _base_negacyclic(X, Y, r, A)
    Z = _inverse(Z, inv, A)
    P = Z[..., :m, :]                   # Z_i
    Q = Z[..., m:, :]                   # Z_{m+i}
    # z[m*j + i] = P[i, j] + Q[i, j-1], with Q[i, -1] wrapping negacyclically
    Qs = jnp.roll(Q, 1, axis=-1)
    wrapmask = np.zeros((r,), dtype=bool)
    wrapmask[0] = True
    Qs = jnp.where(jnp.asarray(wrapmask), A.neg(Qs), Qs)
    zm = A.add(P, Qs)                   # (..., m=i, r=j)
    return jnp.swapaxes(zm, -1, -2).reshape(*batch, n)


def nussbaumer_negacyclic_ring(x, y):
    """Negacyclic product of uint32 vectors over Z_{2^32-1}.

    x, y: (..., n) uint32 ring representatives; returns (..., n) normalized
    representatives of (x * y mod (X^n + 1)) mod (2^32 - 1)."""
    return ring_normalize(_nussbaumer(x, y, _RING_ARITH))


def nussbaumer_negacyclic_modq(x, y, ps):
    """Negacyclic product over Z_q via the Nussbaumer recursion — exact for
    ALL canonical operands (no coefficient-magnitude restriction): every
    butterfly, halving and base product is carried out mod q.  The
    reference's Z_{2^32-1} path (NTT.cu:147-277) is wrong-silent outside
    its domain; this variant removes the domain entirely."""
    A = _modq_arith(ps.q, ps.r32, ps.r32_shoup, ps.one_shoup)
    return _nussbaumer(x, y, A)


def ring_exact_coeff_bound(n: int) -> int:
    """Largest operand-coefficient magnitude C such that the Z_{2^32-1}
    ring path is provably exact: every true product coefficient is a sum of
    exactly n terms +-x_i*y_j, so |z_k| <= n*C^2 must stay <= RING_MOD//2
    for the signed recovery to be unambiguous."""
    import math
    return math.isqrt((RING_MOD // 2) // n)


# Batch chunk for the jitted pipelines: the tensorized recursion's
# intermediates ((..., 2m, r) planes through log2(m) butterfly levels plus
# the m-term base-product accumulation) grow ~linearly with batch, and a
# single-shot batch >= 2048 at n=1024 crashes the TPU worker (measured
# round 3).  Shapes are static under jit, so large batches run as a
# sequential lax.map over fixed-size chunks — same results, bounded
# footprint, any batch size.
_BATCH_CHUNK = 512


def _chunked_pairs(body, x, y, chunk: int = _BATCH_CHUNK):
    """Apply body((C, n), (C, n)) -> (C, n) over an arbitrary-leading-shape
    pair, sequentially in chunks of `chunk` rows."""
    shape = x.shape
    n = shape[-1]
    xf = x.reshape(-1, n)
    yf = y.reshape(-1, n)
    B = xf.shape[0]
    if B <= chunk:
        return body(xf, yf).reshape(shape)
    k = B // chunk
    bulk = jax.lax.map(
        lambda ab: body(ab[0], ab[1]),
        (xf[:k * chunk].reshape(k, chunk, n),
         yf[:k * chunk].reshape(k, chunk, n)))
    parts = [bulk.reshape(k * chunk, n)]
    if B % chunk:
        parts.append(body(xf[k * chunk:], yf[k * chunk:]))
    return jnp.concatenate(parts).reshape(shape)


@functools.lru_cache(maxsize=None)
def polymul_nussbaumer_fn(name: str, max_coeff: int | None = None):
    """Jitted negacyclic polymul mod q via the Nussbaumer Z_{2^32-1} ring
    path (the reference's exact-integer formulation, NTT.cu:147-277).

    Ring representatives are mapped to signed integers (reps > 2^31 are
    negative) and reduced mod q — exact only while the true product
    coefficients stay <= 2^31 in magnitude.  `max_coeff` declares the
    caller's operand bound (None means full-range canonical residues, q-1);
    a declared bound outside the provable domain raises instead of
    returning silently wrong results.  For unrestricted operands use
    polymul_nussbaumer_q_fn (exact mod-q recursion)."""
    from ..params import get_params
    ps = get_params(name)
    q = ps.q
    mc = q - 1 if max_coeff is None else int(max_coeff)
    limit = ring_exact_coeff_bound(ps.n)
    if mc > limit:
        raise ValueError(
            f"nussbaumer ring path is exact only for operand coefficients "
            f"<= {limit} at n={ps.n} (declared max_coeff={mc}); pass "
            f"max_coeff<={limit} for small/sparse operands, or use "
            f"algo='nussbaumer' (the exact mod-q recursion, "
            f"polymul_nussbaumer_q_fn) for full-range operands")
    m_mod_q = RING_MOD % q
    half = jnp.uint32(RING_MOD // 2)

    def one(x, y):
        z = nussbaumer_negacyclic_ring(x, y)
        pos = reduce_u32(z, q, ps.one_shoup)
        neg = jnp.where(pos >= u32(m_mod_q), pos - u32(m_mod_q),
                        pos + u32(q - m_mod_q))
        return jnp.where(z > half, neg, pos)

    return jax.jit(lambda x, y: _chunked_pairs(one, u32(x), u32(y)))


@functools.lru_cache(maxsize=None)
def polymul_nussbaumer_q_fn(name: str):
    """Jitted negacyclic polymul via the exact mod-q Nussbaumer recursion —
    valid for ALL canonical operands (no domain restriction, unlike the
    reference's Z_{2^32-1} path and polymul_nussbaumer_fn)."""
    from ..params import get_params
    ps = get_params(name)
    return jax.jit(lambda x, y: _chunked_pairs(
        lambda a, b: nussbaumer_negacyclic_modq(a, b, ps),
        u32(x), u32(y)))
