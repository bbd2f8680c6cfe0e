"""MXU-accelerated fused negacyclic polymul: butterfly stages as int8
systolic-array matmuls.

The roll-based fused kernel (ntt_pallas.py) is VPU-bound: ~60% of its time is
butterfly data movement (lane rolls + selects) and the rest 32-bit Shoup
multiplies, both on the vector unit.  This variant moves almost all of that
onto the MXU, the unit with ~100x the int multiply-accumulate throughput:

- Data lives as a LIST of (tile_b, 128) vreg tiles.  The first
  `Lr = log2(n) - 7` forward stages (pair distance >= 128) pair whole
  tiles, so they are pure list regrouping with per-butterfly scalar Shoup
  twiddles baked into the instruction stream.
- The remaining 7 stages act independently inside each aligned 128-lane
  block (pair distance < 128 never crosses a block), so their composition is
  a block-diagonal linear map: one exact 128x128 matrix per block, derived
  offline by running the stage recurrences of the merged-psi CT forward /
  GS inverse (same tables as ntt_pallas, so results are bit-identical) over
  the identity basis in int64 mod q.
- Each matmul runs on the MXU in int8 with balanced base-256 digits
  (biased-byte extraction); the CONSTANT matrices absorb the basis weights
  2^{8i} *before* their own digit split (W^(i) = 2^{8i} W mod q), so one
  (TB,128) x (128, D*128) int8 matmul per (block, digit) yields partial
  sums c_j with out = sum_j 2^{8j} c_j + const (mod q).  Recombination
  Horner-packs the classes into provably int32-exact groups: ONE Shoup
  multiply per coefficient at n=1024 instead of a 10-stage butterfly chain.
- The inverse mirrors it: per-block inverse matmul (stages with distance
  < 128, i.e. the first 7 GS-inverse stages) followed by Lr inverse wide
  stages, whose last carries n^{-1} and canonicalizes.
- Worst-case magnitudes are tracked as python ints at trace time; values
  stay lazy (unreduced) until a uint32 bound would overflow, constant
  multiplies use sloppy (carry-free) Shoup products, and sparse q get a
  multiply-free shift-add reduction (modmul.fast_reduce_2q).

Replaces the same reference code paths as ntt_pallas.py (the per-stage
kernel pipelines, NTT.cu:2034-2081) but maps the FLOPs onto the TPU's
matrix unit instead of translating the butterfly loops onto the VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modmul import (fast_reduce_2q, shoup_mulmod_sloppy,
                     sparse_reduce_plan, widemul32)
from .ntt_pallas import _csub
from .tables import NttTables, get_tables

__all__ = ["polymul_mxu_fn", "polymul_fixed_mxu_fn", "ntt_mxu_fn",
           "intt_mxu_fn", "get_mxu_tables", "fixed_fold_plan",
           "fixed_fold_tables", "polymul_fixed_folded_mxu_fn"]

_BW_MAX = 128            # block width = one vreg of lanes


# ----------------------------------------------------------------------
# Offline table construction (exact, numpy int64 mod q).
# ----------------------------------------------------------------------

def _ndigits(q: int) -> int:
    """Smallest D such that D balanced base-256 digits (each in [-128,127])
    cover the centered range [-(q//2), q-1-q//2]."""
    D = 1
    while True:
        span = (256 ** D - 1) // 255
        if 127 * span >= q - 1 - (q // 2) and 128 * span >= q // 2:
            return D
        D += 1


def _balanced_digits(a: np.ndarray, D: int) -> list[np.ndarray]:
    """Split int64 array into D balanced base-256 digits, each in [-128,127];
    exact: sum_i 256^i d_i == a."""
    digs = []
    a = a.astype(np.int64).copy()
    for _ in range(D - 1):
        d = ((a + 128) & 255) - 128
        digs.append(d)
        a = (a - d) >> 8
    assert np.all(a >= -128) and np.all(a <= 127), "digit overflow"
    digs.append(a)
    return digs


def _fwd_matrix(tbl: NttTables, s_lo: int) -> np.ndarray:
    """Exact (n, n) matrix of merged-psi CT forward stages s in [s_lo, L),
    mod q — the linear map the roll kernel's _fwd_stages applies (with the
    same per-lane twiddles, ct_fwd_full), reduced to canonical residues."""
    n, q, L = tbl.n, tbl.q, tbl.logn
    j = np.arange(n)
    M = np.eye(n, dtype=np.int64)
    for s in range(s_lo, L):
        t = n >> (s + 1)
        w = tbl.ct_fwd_full[s].astype(np.int64)
        sign = np.where((j & t) != 0, -1, 1)
        M = (M[j & ~t] + (sign * w)[:, None] * M[j | t]) % q
    return M % q


def _inv_matrix(tbl: NttTables, s_hi: int) -> np.ndarray:
    """Exact (n, n) matrix of merged-psi GS inverse stages s in [0, s_hi)
    mod q (matching _inv_stages; the last stage, if included, scales both
    branches per gs_inv_full's fused n^{-1} row)."""
    n, q, L = tbl.n, tbl.q, tbl.logn
    j = np.arange(n)
    bitarr = lambda t: (j & t) != 0  # noqa: E731
    M = np.eye(n, dtype=np.int64)
    for s in range(s_hi):
        t = 1 << s
        w = tbl.gs_inv_full[s].astype(np.int64)
        u = M[j & ~t]
        v = M[j | t]
        if s == L - 1:
            sign = np.where(bitarr(t), -1, 1)
            M = (w[:, None] * (u + sign[:, None] * v)) % q
        else:
            M = np.where(bitarr(t)[:, None],
                         (w[:, None] * (u - v)) % q,
                         (u + v) % q)
    return M % q


def _apply_shrink(v, m, limit_m: int, q: int, one_shoup: int):
    """Reduce one lazy term (value v, inclusive worst-case max m) to
    <= limit_m (a 2^k*q - 1 threshold), by the cheapest exact route: a
    sloppy-Shoup-by-1 fold when the bound is huge, else a _csub_to-style
    csub chain.  v may be None (static cost/bound mode — the SAME code
    plans and emits, so they can never disagree).  Returns
    (v', m', shoups, csubs)."""
    sh = cs = 0
    if m > 16 * q:
        if v is not None:
            v = shoup_mulmod_sloppy(v, jnp.uint32(1),
                                    jnp.uint32(one_shoup), q)
        m = 4 * q - 1
        sh = 1
    while m > limit_m:
        t = max((m // q).bit_length() - 1,
                ((limit_m + 1) // q).bit_length() - 1)
        c = (1 << t) * q
        if v is not None:
            v = _csub(v, c)
        cs += 1
        m = max(c - 1, m - c)
    return v, m, sh, cs


def _pack_terms(vals, maxima, q: int, one_shoup: int):
    """Deterministic overflow fixer for the recombination term sum: while
    the inclusive maxima could sum past uint32, shrink the largest term
    (earliest on ties) one threshold step (2q-1, then q-1).  `vals` may be
    all-None for static planning.  Returns (vals, maxima, shoups, csubs)."""
    vals, maxima = list(vals), list(maxima)
    sh = cs = 0
    while sum(maxima) >= 1 << 32:
        k = max(range(len(maxima)), key=lambda i: (maxima[i], -i))
        assert maxima[k] > q - 1, "recombination terms cannot fit uint32"
        limit = 2 * q - 1 if maxima[k] > 2 * q - 1 else q - 1
        vals[k], maxima[k], s1, c1 = _apply_shrink(
            vals[k], maxima[k], limit, q, one_shoup)
        sh += s1
        cs += c1
    return vals, maxima, sh, cs


def _initial_terms(groups, bounds, q: int) -> list[int]:
    """Inclusive worst-case maxima of the recombination terms before the
    overflow fixer: const row (< q), then per group either the exactly-
    biased Horner value (group 0: u = g + gb <= 2*gb) or the post-Shoup
    2q-1 (non-zero groups)."""
    terms = [q - 1]
    for j0, ln in groups:
        terms.append(2 * _group_bound(bounds, j0, ln) if j0 == 0
                     else 2 * q - 1)
    return terms


def _plan_cost(groups, bounds, q: int, downstream: str):
    """(shoups, csubs, ngroups) of one candidate plan plus its lazy output
    bound — the exact mirror of _recombine_classes' emission (shared
    _pack_terms/_apply_shrink code paths)."""
    sh = sum(1 for j0, _ in groups if j0 != 0)
    cs = sh                                   # csub to < 2q after each Shoup
    terms = _initial_terms(groups, bounds, q)
    _, terms, s2, c2 = _pack_terms([None] * len(terms), terms, q, 0)
    sh += s2
    cs += c2
    bound = sum(terms) + 1        # exclusive, matching _recombine_bound
    if downstream != "any" and bound > 2 * q:
        if bound <= 16 * q:                  # reduce_bounded_2q csub chain
            cs += _chain_csubs(bound, 2 * q, q)
        elif downstream == "reduce_shoup":
            sh += 1
            cs += 1
        else:                                # sparse shift-add, no multiply
            cs += 3
    return (sh, cs, len(groups)), bound


def _plan_groups(bounds: list[int], q: int,
                 downstream: str = "any") -> list[tuple[int, int]]:
    """Pack digit classes j (weight 2^{8j}, worst-case |c_j| <= bounds[j])
    into consecutive groups whose int32 Horner combination
    g = c_{j0} + 256*c_{j0+1} + ... provably fits in int32.  Returns
    [(j0, len), ...]; group 0 starting at class 0 needs NO modmul, every
    other group costs one Shoup multiply by 2^{8*j0} mod q.

    All 2^(Dout-1) consecutive compositions are enumerated and costed with
    the SAME emission model _recombine_classes uses (_plan_cost), including
    the deterministic overflow fixer that shrinks terms when the lazy
    uint32 sum would exceed 2^32.  Groups are biased by their EXACT bound
    (u = g + gb), not a blanket 2^31 — for 30-bit q the difference decides
    whether the fixer fires at all (2^31 + 3q > 2^32 for q > 2^29.4, so a
    2^31 bias forced a Shoup fallback on every qtesla-p-iii recombination;
    measured round 3).

    `downstream` names what consumes the lazy output (the forward feeds
    the Barrett pointwise, which accepts any uint32: 'any'; the inverse
    must reduce to [0, 2q): 'reduce_sparse' when q has a shift-add plan,
    'reduce_shoup' otherwise) — the post-reduction cost depends on the
    plan's output bound, so the optimum depends on the consumer."""
    D = len(bounds)

    def compositions(j):
        if j == D:
            yield []
            return
        for ln in range(1, D - j + 1):
            if _group_bound(bounds, j, ln) < (1 << 31):
                for rest in compositions(j + ln):
                    yield [(j, ln)] + rest

    # Feasibility: _pack_terms can shrink each term to at most q-1 (never
    # below its initial value), so a composition fits uint32 iff the sum
    # of min(term, q-1) over its initial terms does.  Infeasible candidates
    # must be PRUNED, not costed — _pack_terms (shared with emission)
    # asserts on them, and for q in [~1.07e9, 2^30) the always-enumerated
    # all-singleton composition is infeasible while 3-group plans still
    # fit (code-review round 3).
    def feasible(g):
        return sum(min(t, q - 1)
                   for t in _initial_terms(g, bounds, q)) < 1 << 32

    cands = [g for g in compositions(0) if feasible(g)]
    if not cands:
        raise ValueError(
            f"q={q}: recombination terms cannot fit uint32 for any digit "
            f"grouping of bounds {bounds}")
    return min(cands,
               key=lambda g: _plan_cost(g, bounds, q, downstream)[0])


def _group_bound(bounds, j0, ln) -> int:
    return sum((256 ** m) * bounds[j0 + m] for m in range(ln))


def _reduce_kind(q: int) -> str:
    """The downstream tag _plan_groups costs for post-recombination
    canonicalization: shift-add when q is sparse, Shoup otherwise."""
    return "reduce_sparse" if sparse_reduce_plan(q) else "reduce_shoup"


def _split_bias(D: int, base: int) -> int:
    """The borrow-propagation pre-bias of a D-plane balanced base-`base`
    split: sum of (base/2)*base^i over the D-1 low planes."""
    lb = base.bit_length() - 1
    return sum((base // 2) << (lb * i) for i in range(D - 1))


def _covers(D: int, bound: int, base: int = 256) -> bool:
    """Can D balanced base-`base` digit planes (low planes in
    [-base/2, base/2), top plane the arithmetic-shift residue, which must
    fit int8) represent every centered value of an operand in [0, bound)
    (off = bound//2)?  Exact predicate mirroring _digit_planes' bit
    algebra: the biased value must fit int32 and the top shift stay
    within the 32-bit word."""
    off = bound >> 1
    lb = base.bit_length() - 1
    bias = _split_bias(D, base)
    s = lb * (D - 1)
    if s > 28 or bound - 1 - off + bias >= 1 << 31:
        return False
    top_min = (-off + bias) >> s
    top_max = (bound - 1 - off + bias) >> s
    return -128 <= top_min and top_max <= 127


def _plane_count(in_bound: int, base: int = 256) -> int | None:
    """Smallest digit-plane count covering a lazy operand in [0, in_bound)
    at the given digit base (256: up to 4 planes; 128: up to 5 — the
    _covers shift cap), or None if uncoverable."""
    for D in range(1, 7):
        if _covers(D, in_bound, base):
            return D
    return None


def _lazy_fwd_schedule(q: int, Lr: int):
    """Per-wide-stage (lo_bnd, h_bnd) Harvey-laziness schedule for Lr
    merged-CT stages starting from canonical input, chosen so every uint32
    sum provably fits; returns (schedule, final output bound)."""
    bnd = q
    sched = []
    for _ in range(Lr):
        h_bnd = 4 * q
        lo_bnd = bnd
        if lo_bnd + h_bnd > 1 << 32:
            h_bnd = 2 * q
        if lo_bnd + h_bnd > 1 << 32:
            lo_bnd = 2 * q
        sched.append((lo_bnd, h_bnd))
        bnd = lo_bnd + h_bnd
    return sched, bnd


def _recombine_bound(groups, bounds, q: int) -> int:
    """STATIC mirror of _recombine_classes' output-bound arithmetic (the
    shared _initial_terms + _pack_terms path), so plan builders can size a
    consumer's digit split before tracing; the kernels assert the traced
    bound equals this.  EXCLUSIVE: the term maxima are inclusive, so the
    output is their sum + 1 — every consumer (digit-split coverage,
    reduce_bounded_2q, store-bound handoffs) takes exclusive bounds, and
    an inclusive sum passed as exclusive would size coverage one short of
    the attainable maximum (code-review round 3)."""
    terms = _initial_terms(groups, bounds, q)
    _, terms, _, _ = _pack_terms([None] * len(terms), terms, q, 0)
    return sum(terms) + 1


def _matrix_digit_block(K, q: int, Din: int, Dout: int, mw: np.ndarray,
                        in_base: int = 256):
    """One matrix's int8 digit tables: K (bw, bw) exact ints, INPUT-major
    (out = x @ K).  Returns (Wblk int8 (Din, bw, Dout*bw), colsum object
    (bw,)) and accumulates max-|digit| into mw (Din, Dout) — the single
    shared implementation of the in_base^i-scaled centered balanced-digit
    expansion used by both the single-chip stage tables and the sharded
    segment plans (parallel/sharded_mxu.py).  The matrix digits are always
    base-256 (class weights 2^{8j}); `in_base` is the INPUT split's base —
    128 halves the input digit magnitudes (hence the class bounds) at the
    price of one extra plane, which is what buys the p-sets a 1-Shoup
    no-overflow recombination plan."""
    bw = K.shape[0]
    K = K.astype(object) % q
    Wblk = np.zeros((Din, bw, Dout * bw), dtype=np.int8)
    for i in range(Din):
        Ki = (K * pow(in_base, i, q)) % q
        Kc = np.where(Ki > q // 2, Ki - q, Ki)   # centered, |.| <= q/2
        for jd, dig in enumerate(_balanced_digits(Kc.astype(np.int64),
                                                  Dout)):
            Wblk[i, :, jd * bw:(jd + 1) * bw] = dig.astype(np.int8)
            mw[i, jd] = max(mw[i, jd], np.abs(dig).max())
    return Wblk, K.sum(axis=0)


def _input_digit_maxima(Din: int, off: int, in_bound: int,
                        base: int = 256) -> list[int]:
    """Exact per-plane max |digit_i(v - off)| over v in [0, in_bound).

    Planes 0..Din-2 are balanced (<= base/2); the TOP plane is the
    arithmetic-shift residue of the biased value, bounded by the actual
    centered range — e.g. only +-32 for a canonical 30-bit q in 4 planes.
    Using the exact top bound instead of a blanket base/2 is what lets the
    Horner packing fit two classes per int32 group for the p-sets."""
    cmin, cmax = -off, in_bound - 1 - off
    lb = base.bit_length() - 1
    bias = _split_bias(Din, base)
    s = lb * (Din - 1)
    top = max(abs((cmin + bias) >> s), abs((cmax + bias) >> s))
    return [base // 2] * (Din - 1) + [int(top)]


def _digit_bounds(mw: np.ndarray, bw: int, dmax: list[int]):
    """Worst-case |c_j| class bounds from the digit maxima (matrix mw and
    per-plane input maxima dmax)."""
    Din, Dout = mw.shape
    bounds = [int(sum(bw * dmax[i] * mw[i, j] for i in range(Din)))
              for j in range(Dout)]
    return bounds


def _const_row(colsum, off: int, groups, bounds, q: int) -> np.ndarray:
    """Per-output const row folding the operand-centering offset and the
    per-group exact biases (u_g = g + gb_g exactly by two's-complement
    wraparound; gb_g = the group's Horner bound, so u_g <= 2*gb_g — far
    tighter than a blanket 2^31 for small groups, which is what keeps the
    uint32 term sum under 2^32 for the 30-bit-q parameter sets)."""
    bias_sum = sum(_group_bound(bounds, j0, ln) * pow(2, 8 * j0, q)
                   for j0, ln in groups)
    return np.asarray([(off * int(cs) - bias_sum) % q for cs in colsum],
                      dtype=np.uint32)


def _block_digit_tables(M: np.ndarray, q: int, bw: int, Din: int, Dout: int,
                        off: int, in_bound: int, downstream: str = "any",
                        in_base: int = 256):
    """Turn a block-diagonal (n, n) stage matrix into MXU operand tables.

    Din is the number of INPUT digit planes (>= the matrix digit count when
    the operand is lazy — the extra plane is what lets q-i/q-iii skip the
    pre-split canonicalization chain entirely), Dout the number of digit
    classes of the centered matrix entries, in_base the input split's
    digit base (256 or 128 — see _matrix_digit_block).

    Returns (W, const, bounds): W int8 of shape (nb, Din, bw, Dout*bw) with
    W[b, i, :, j*bw:(j+1)*bw] = digit_j(center(in_base^i * M_b^T mod q));
    const uint32 (nb, 1, bw) folding the operand-centering offset `off`
    (q//2 for canonical inputs, lazy-bound//2 for the lazy forward split)
    and the recombination biases; bounds[j] = exact worst-case |c_j| over
    all blocks (used to plan the int32 class packing).  In-kernel:

        out_k = sum_j 2^{8j} c_jk + const_k   (mod q),
        c_j   = sum_i digits_i(x - off) @ W[b, i][:, j*bw:(j+1)*bw].
    """
    n = M.shape[0]
    nb = n // bw
    W = np.zeros((nb, Din, bw, Dout * bw), dtype=np.int8)
    colsums = np.zeros((nb, bw), dtype=object)
    mw = np.zeros((Din, Dout), dtype=np.int64)   # max |digit_j(b^i K)|
    for b in range(nb):
        Mb = M[b * bw:(b + 1) * bw, b * bw:(b + 1) * bw]
        # block-diagonality sanity: nothing outside the diagonal block
        row = M[b * bw:(b + 1) * bw].copy()
        row[:, b * bw:(b + 1) * bw] = 0
        assert not row.any(), "stage range is not block-local"
        W[b], colsums[b] = _matrix_digit_block(Mb.T, q, Din, Dout, mw,
                                               in_base)
    bounds = _digit_bounds(mw, bw,
                           _input_digit_maxima(Din, off, in_bound, in_base))
    groups = _plan_groups(bounds, q, downstream)
    const = np.zeros((nb, 1, bw), dtype=np.uint32)
    for b in range(nb):
        const[b, 0, :] = _const_row(colsums[b], off, groups, bounds, q)
    return W, const, bounds, groups


# Relative VPU-op cost estimates for the split search: a sloppy Shoup is
# ~4 vector ops (2 multiplies + widemul-hi + sub), a csub ~2 (compare +
# select), and an extra input digit plane ~3 extraction ops per input
# coeff plus Dout int32 accumulate adds per output coeff.  The MXU MACs an
# extra plane adds are not costed — at bw=128 they hide behind the VPU
# work (measured: the bw sweep in PERF_NOTES shows MACs only stop hiding
# at bw>=256).
_COST_SHOUP, _COST_CSUB, _COST_PLANE = 4, 2, 3
# Penalty per digit plane BEYOND the minimal covering count among the
# candidate splits, for kernels whose MXU dots are NOT hidden behind wide-
# stage VPU work (the SP segment kernels: at k=8 there are no wide stages
# at all).  Measured round 3b/4 (docs/PERF_NOTES.md round-4 entry):
#   - SP seg3 at base-128 (Din=5 vs base-256's 4): 7-19% slower at k=4/8
#     — the un-penalized model had ranked it cheaper by one csub;
#   - fixed-fold plan A/B at EQUAL plane count (Din=4 both): base-128
#     measured 1.6% FASTER (0.730 vs 0.742 ms) — its saved csub is real,
#     so a per-base extraction surcharge is the WRONG model shape; the
#     cost is carried by the extra plane, not the 7-bit alignment.
# The flagship planners keep this at zero: there the dots hide (round-2
# co_dots ablation), and the measured-neutral lazy-forward extra plane
# (+0.7%) says so.
_COST_PLANE_EXTRA = 4


def _chain_csubs(bnd: int, limit: int, q: int) -> int:
    """Static csub count of the _csub_to chain bnd -> limit, computed by
    running _csub_to itself in static mode (v=None) — the SAME code plans
    and emits, so the cost model can never drift from the chain the
    kernel would generate."""
    return _csub_to(None, bnd, limit, q)[2]


def _search_split(M: np.ndarray, q: int, bw: int, in_bound: int,
                  downstream: str):
    """Search the input digit split of a stage-matrix table over the
    candidate (base, plane-count) pairs: base-256 at the minimal covering
    plane count, and base-128 — halving the input digit magnitudes (hence
    every class bound) for one extra plane, which for the 30-bit-q p-sets
    turns a 2-Shoup overflow-fixed recombination into a 1-Shoup
    no-overflow one (round-3 measurement).  Each candidate is built in
    full and costed with the same static model the emission uses
    (_plan_cost).  Returns (cost, (base, Din, W, const, bounds, groups))
    for the cheapest candidate, or None when no base covers in_bound."""
    Dout = _ndigits(q)
    best = None
    for base in (256, 128):
        Din = _plane_count(in_bound, base)
        if Din is None:
            continue
        W, const, bounds, groups = _block_digit_tables(
            M, q, bw, Din, Dout, in_bound >> 1, in_bound, downstream, base)
        (sh, cs, ng), _ = _plan_cost(groups, bounds, q, downstream)
        cost = (_COST_SHOUP * sh + _COST_CSUB * cs
                + (_COST_PLANE + Dout) * Din, ng)
        if best is None or cost < best[0]:
            best = (cost, (base, Din, W, const, bounds, groups))
    return best


class MxuTables:
    """Matmul-form stage tables for one parameter set.

    `bw` is the matmul block width: stages with pair distance < bw are
    folded into the per-block matrices (MXU), the log2(n/bw) wider stages
    stay as tile-regrouping VPU butterflies.  Wider blocks trade MXU MACs
    (per-coeff cost ∝ bw·D²) for fewer VPU wide stages — bw=128 is the
    measured optimum on v5e at n=1024: bw=256/512 ran 1.32/1.87 ms vs
    1.04 ms because the doubled MACs stop hiding behind the VPU work
    (scripts/probe_mxu.py + docs/PERF_NOTES.md rejected-ideas, 2026-08)."""

    def __init__(self, tbl: NttTables, bw: int | None = None):
        self.tbl = tbl
        n, q, L = tbl.n, tbl.q, tbl.logn
        self.n, self.q, self.logn = n, q, L
        self.bw = bw = min(bw or _BW_MAX, n)
        assert bw >= 128 or bw == n, "block width must be >= one vreg"
        self.nb = n // bw
        self.Lr = L - bw.bit_length() + 1      # roll stages (distance >= bw)
        self.D = _ndigits(q)
        # wide-stage laziness schedule: per stage (lo_bnd, h_bnd) chosen so
        # every uint32 sum provably fits; final bound F = last lo_bnd+h_bnd
        self.fwd_sched, bnd = _lazy_fwd_schedule(q, self.Lr)
        # The forward digit split may use MORE input planes than the matrix
        # has digit classes: Df = smallest plane count covering the lazy
        # wide-stage output bound at the searched base (base-256 caps at 4
        # planes, base-128 at 5 — _covers' 28-bit shift limit).  One extra
        # int8 plane + dot (hidden behind the VPU work) buys skipping the
        # canonicalizing csub chain before the split; _search_split
        # cost-compares the lazy candidates against the canonical
        # chain-then-split fallback.
        Mf = _fwd_matrix(tbl, self.Lr)
        lazy = _search_split(Mf, q, bw, bnd, "any") if bnd > q else None
        canon = _search_split(Mf, q, bw, q, "any")
        # canonical pays the _fwd_rolls tail csub chain bnd -> q per block
        ccost = (canon[0][0] + _COST_CSUB * _chain_csubs(bnd, q, q),
                 canon[0][1])
        self.fwd_lazy = lazy is not None and lazy[0] <= ccost
        self.fwd_bound = bnd if self.fwd_lazy else q
        (self.fwd_base, self.Df, self.wf, self.constf, self.bounds_f,
         self.groups_f) = (lazy if self.fwd_lazy else canon)[1]
        self.fwd_off = self.fwd_bound >> 1
        # Lazy pointwise -> inverse handoff: the Hadamard product is left
        # UNREDUCED (sloppy-Shoup fold < 4q plus a < 2q term) and the
        # inverse digit split covers that bound directly — deleting the
        # pointwise's canonicalizing csubs (round-2 VERDICT item 2's
        # suggested pattern).  Exclusive bound 6q-1 when a+b fits uint32
        # without compressing the sloppy term, else one csub first (4q-1).
        # Engaged ONLY when the lazy bound costs no extra digit plane:
        # for the D=4 p-sets the csubs are free to delete (measured
        # p-iii 5.1 -> 5.21 M/s), but for D=3 sets the 4th inverse plane
        # cancels the savings (measured q-iii 15.52 -> 15.46 M/s) — those
        # keep the canonical pointwise.
        self.pw_bound = pointwise_bound(q)
        self.inv_off = self.pw_bound >> 1
        ipick = _search_split(_inv_matrix(tbl, L - self.Lr), q, bw,
                              self.pw_bound, _reduce_kind(q))
        (self.inv_base, self.Di, self.wi, self.consti, self.bounds_i,
         self.groups_i) = ipick[1]


@functools.lru_cache(maxsize=None)
def get_mxu_tables(name: str, bw: int | None = None) -> MxuTables:
    return MxuTables(get_tables(name), bw)


# ----------------------------------------------------------------------
# Kernel building blocks (trace-time python over static D / nb / Lr).
# ----------------------------------------------------------------------

def _digit_planes(v, off: int, D: int, base: int = 256):
    """uint32 in [0, bound) -> D balanced-digit int8 planes of v - off at
    the given power-of-two digit base (off = bound//2; the centered+biased
    value must fit int31 and the top shift stay <= 28 bits — _covers, the
    table builder's coverage check, guarantees both).

    Biased-digit extraction: adding the base/2-per-plane bias
    (_split_bias) pre-propagates every borrow at once, so digit i is just
    field i minus base/2 — no sequential carry chain; the decomposition
    a = sum_i ((a >> lb*i) & (base-1)) * base^i + (a >> lb*(D-1))*base^(D-1)
    is exact for any int32 a by two's complement, so lazy inputs beyond
    2^31 (added in wrapping uint32, then bitcast) are handled exactly."""
    lb = base.bit_length() - 1
    bias = _split_bias(D, base)
    a = lax.bitcast_convert_type(v + np.uint32((bias - off) % (1 << 32)),
                                 jnp.int32)
    planes = []
    for i in range(D - 1):
        planes.append((((a >> np.int32(lb * i)) & np.int32(base - 1))
                       - np.int32(base // 2)).astype(jnp.int8))
    planes.append((a >> np.int32(lb * (D - 1))).astype(jnp.int8))
    return planes


def _one_block_matmul(planes_b, b, w_ref, const_ref, mt: MxuTables,
                      groups, bounds, din: int):
    """One block's stage matrix: int8 MXU matmuls + packed Shoup
    recombination.  Input: D digit planes (TB, bw) int8 of this block's
    centered values; output (TB, bw) uint32, lazy, congruent mod q.

    Digit classes are Horner-packed per the precomputed `groups` plan:
    g = c_{j0} + 256 c_{j0+1} + ... (provably int32-exact), viewed as
    uint32 with the group's exact Horner-bound bias (exact by two's
    complement), so the group starting at class 0 costs NO multiply and
    every other group exactly one Shoup multiply by 2^{8 j0} mod q.
    Worst-case magnitudes are tracked as python ints; conditional
    subtracts are inserted only where the uint32 sum could otherwise
    overflow."""
    return _recombine_classes(planes_b,
                              [w_ref[b, i] for i in range(din)],
                              const_ref[b], mt.bw, mt.q,
                              mt.tbl.ps.one_shoup, groups, bounds)


def _block_matmul(blocks, w_ref, const_ref, mt, groups, bounds,
                  off: int, din: int, base: int):
    """Stage matrix over the block-list representation: per 128-lane block,
    digit split (centered at `off`, `din` base-`base` planes) -> int8 dot
    -> packed recombination.  No concatenation — data stays as nb separate
    (TB, bw) tiles.  Returns (blocks, shared lazy output bound)."""
    outs = [_one_block_matmul(_digit_planes(blk, off, din, base), b,
                              w_ref, const_ref, mt, groups, bounds, din)
            for b, blk in enumerate(blocks)]
    return [v for v, _ in outs], outs[0][1]


def _recombine_classes(planes, w_slices, const_row, bw: int, q: int,
                       one_shoup: int, groups, bounds):
    """int8 digit planes (TB, bw) -> int8 dots against the matching
    (bw, Dout*bw) table slices -> Horner-packed class recombination (see
    _one_block_matmul docstring).  Returns (lazy uint32 (TB, bw),
    exclusive worst-case bound) — the bound comes from the SAME term
    tracking that drives the emitted ops, so consumers
    (reduce_bounded_2q) can never disagree with what was generated."""
    acc = None
    for p_i, w_i in zip(planes, w_slices):
        p = lax.dot_general(p_i, w_i, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        acc = p if acc is None else acc + p
    # term values, biased by each group's EXACT Horner bound gb (u = g + gb
    # in [0, 2*gb], exact by two's-complement wraparound) — _const_row
    # subtracts the same biases mod q
    vals = [const_row]
    for j0, ln in groups:
        g = acc[:, (j0 + ln - 1) * bw:(j0 + ln) * bw]
        for m in range(ln - 2, -1, -1):
            g = acc[:, (j0 + m) * bw:(j0 + m + 1) * bw] + (g << 8)
        u = g.astype(jnp.uint32) + np.uint32(_group_bound(bounds, j0, ln))
        if j0 == 0:
            vals.append(u)
        else:
            w = pow(2, 8 * j0, q)
            s = shoup_mulmod_sloppy(u, np.uint32(w),
                                    np.uint32((w << 32) // q), q)
            vals.append(_csub(s, 2 * q))
    # sum with overflow-aware laziness: the SAME _initial_terms/_pack_terms
    # code the planner and _recombine_bound run statically
    vals, maxima, _, _ = _pack_terms(vals, _initial_terms(groups, bounds, q),
                                     q, one_shoup)
    # EXCLUSIVE output bound (maxima are inclusive); must equal
    # _recombine_bound's static arithmetic
    return functools.reduce(lambda a, v: a + v, vals[1:], vals[0]), \
        sum(maxima) + 1


def _split_blocks(ref, mt: MxuTables):
    """(TB, n) ref -> list of nb (TB, bw) tiles (vreg-aligned reads)."""
    return [ref[:, b * mt.bw:(b + 1) * mt.bw] for b in range(mt.nb)]


def _store_blocks(ref, blocks, mt: MxuTables):
    """Write nb (TB, bw) tiles into the (TB, n) output ref."""
    for b, blk in enumerate(blocks):
        ref[:, b * mt.bw:(b + 1) * mt.bw] = blk


def _csub_to(v, bnd: int, limit: int, q: int):
    """Conditional-subtract chain: value v < bnd -> v' < limit (limit a
    multiple of q >= q), congruent mod q.  Halves the bound per csub with
    power-of-two multiples of q.  v may be None (static cost mode — the
    SAME loop plans and emits).  Returns (v', bnd', csub count)."""
    cs = 0
    while bnd > limit:
        t = max(((bnd - 1) // q).bit_length() - 1,
                (limit // q).bit_length() - 1)
        c = (1 << t) * q
        if v is not None:
            v = _csub(v, c)
        cs += 1
        bnd = max(c, bnd - c)
    return v, bnd, cs


def _fwd_rolls(blocks, mt: MxuTables):
    """Lr merged-psi CT wide stages (distances n/2 .. 128), Harvey-lazy, on
    the block-list representation: a butterfly at distance t >= bw pairs
    whole (TB, bw) tiles, so each stage is pure list regrouping — no rolls,
    selects, slices or concats.  The merged-psi twiddle is a per-butterfly
    SCALAR at these stages (baked-in constant), and the Shoup multiply runs
    on only the upper-half tiles.

    Laziness engine: the worst-case bound is tracked as a python int and
    conditional subtracts are emitted ONLY when the uint32 range demands
    (for q < 2^27 no per-stage csubs fire at all); a final csub chain
    canonicalizes for the digit split.  In [0, q) -> out canonical."""
    q = mt.q
    bnd = q                                    # values < bnd throughout
    for s in range(mt.Lr):
        ws = mt.tbl.ct_fwd_stages[s][0].reshape(-1)
        wsh = mt.tbl.ct_fwd_stages[s][1].reshape(-1)
        half = len(blocks) >> (s + 1)          # tiles per butterfly half
        # precomputed schedule: compress operands only where lo + h would
        # overflow uint32 (MxuTables.fwd_sched)
        lo_bnd, h_bnd = mt.fwd_sched[s]
        out = []
        for b in range(1 << s):
            grp = blocks[b * 2 * half:(b + 1) * 2 * half]
            los, his = [], []
            for k in range(half):
                lo, _, _ = _csub_to(grp[k], bnd, lo_bnd, q)
                h = shoup_mulmod_sloppy(
                    grp[half + k], np.uint32(ws[b]), np.uint32(wsh[b]), q)
                h, _, _ = _csub_to(h, 4 * q, h_bnd, q)
                los.append(lo + h)
                his.append(lo - h + np.uint32(h_bnd))
            out += los + his
        blocks = out
        bnd = lo_bnd + h_bnd
    if mt.fwd_lazy:
        # the digit split covers the lazy range directly (fwd_off = bnd//2)
        return blocks
    return [_csub_to(v, bnd, q, q)[0] for v in blocks]


def _inv_rolls(blocks, mt: MxuTables):
    """Lr merged-psi GS inverse wide stages (distances 128 .. n/2) on the
    block-list representation; accepts [0, 2q); the last stage carries
    n^{-1} on the sum branch and canonicalizes.  Bounds tracked as python
    ints; csubs emitted only when uint32 range demands."""
    q, L = mt.q, mt.logn
    bnd = 2 * q
    for k in range(mt.Lr):
        s = L - mt.Lr + k
        ws = mt.tbl.gs_inv_stages[s][0].reshape(-1)
        wsh = mt.tbl.gs_inv_stages[s][1].reshape(-1)
        last = s == L - 1
        half = (1 << s) // mt.bw          # >= 1: these stages have t >= bw
        nblk = len(blocks) // (2 * half)
        # operand bound in_bnd = 2^t * q: smallest covering bnd, capped at
        # 2^31 so that both lo + hi and lo - hi + in_bnd fit in uint32
        t = 1
        while (1 << t) * q < bnd:
            t += 1
        while (1 << t) * q > 1 << 31:
            t -= 1
        in_bnd = (1 << t) * q
        dq = in_bnd
        out = []
        for b in range(nblk):
            grp = blocks[b * 2 * half:(b + 1) * 2 * half]
            los, his = [], []
            for m in range(half):
                lo, _, _ = _csub_to(grp[m], bnd, in_bnd, q)
                hi, _, _ = _csub_to(grp[half + m], bnd, in_bnd, q)
                d = lo - hi + np.uint32(dq)
                hd = shoup_mulmod_sloppy(d, np.uint32(ws[b]),
                                         np.uint32(wsh[b]), q)
                if last:
                    nw, nwsh = mt.tbl.ninv_fold
                    su = shoup_mulmod_sloppy(lo + hi, np.uint32(nw[0, 0]),
                                             np.uint32(nwsh[0, 0]), q)
                    los.append(_csub_to(su, 4 * q, q, q)[0])
                    his.append(_csub_to(hd, 4 * q, q, q)[0])
                else:
                    los.append(lo + hi)
                    his.append(hd)
            out += los + his
        blocks = out
        bnd = q if last else max(2 * in_bnd, 4 * q)
    return blocks


def _fwd_mxu(blocks, refs, mt: MxuTables):
    """Full forward NTT on the block list: wide stages -> per-block digit
    split + MXU matmul.  Output blocks lazy uint32 (< 2^32, bound per the
    packing plan); concatenated order identical to ntt_fwd_merged."""
    if mt.Lr:
        blocks = _fwd_rolls(blocks, mt)
    blocks, _ = _block_matmul(blocks, refs["wf"], refs["constf"], mt,
                              mt.groups_f, mt.bounds_f, mt.fwd_off, mt.Df,
                              mt.fwd_base)
    return blocks


def _reduce_2q(v, mt: MxuTables):
    """Any uint32 -> [0, 2q): sparse shift-add reduction when q qualifies,
    else sloppy Shoup by w = 1 plus one csub."""
    return fast_reduce_2q(v, mt.q, mt.tbl.ps.one_shoup)


def reduce_bounded_2q(v, bound: int, q: int, one_shoup: int):
    """Value v < bound -> [0, 2q), choosing the cheapest exact route: a
    no-op when already there, a short csub chain when the bound is a small
    multiple of q (the recombination-fallback case), else the generic
    fast_reduce_2q."""
    if bound <= 2 * q:
        return v
    if bound <= 16 * q:
        return _csub_to(v, bound, 2 * q, q)[0]
    return fast_reduce_2q(v, q, one_shoup)


def pointwise_bound(q: int) -> int:
    """The pointwise output-bound policy (see MxuTables): lazy when the
    consumer's digit split covers it without an extra plane, else q
    (canonical, csub chain) — shared by the flagship and SP-segment
    kernels.  EXCLUSIVE bound: the lazy sum's inclusive max is 6q-2
    (sloppy fold <= 4q-1 plus reduced low term <= 2q-1), so the bound is
    6q-1 (or 4q-1 after one compressing csub when 6q-2 overflows uint32)
    — an inclusive max handed to the split planner as exclusive would
    undersize coverage by one (code-review round 3)."""
    pw_lazy = 6 * q - 1 if 6 * q - 2 < 1 << 32 else 4 * q - 1
    return pw_lazy if _plane_count(pw_lazy) == _ndigits(q) else q


def pointwise_lazy(xb, yb, q: int, ps, pw_bound: int):
    """Hadamard mulmod for one block pair (any uint32 inputs, LAZY output
    < pw_bound, congruent mod q) — the reference pointwise_mult
    (NTT.cu:1155-1160) with lazy folds: z = (hi*2^32 + lo) mod q =
    hi*r32 + lo (mod q).  The sloppy-Shoup fold stays < 4q and the low
    term < 2q; when their sum fits uint32 (pw_bound = 6q-1, exclusive)
    NO csub runs at all — the inverse matmul's digit split covers the
    bound directly, deleting the three canonicalizing csubs the round-2
    pointwise paid."""
    hi, lo = widemul32(xb, yb)
    a = shoup_mulmod_sloppy(hi, jnp.uint32(ps.r32),
                            jnp.uint32(ps.r32_shoup), q)   # < 4q
    if pw_bound < 6 * q - 1:
        a = _csub(a, 2 * q)                                # < 2q
    b = fast_reduce_2q(lo, q, ps.one_shoup)                # < 2q
    z = a + b
    if pw_bound <= q:          # canonical consumer (pw laziness disabled)
        z = _csub(_csub(z, 2 * q), q)
    return z


def _pointwise(xb, yb, mt: MxuTables):
    return pointwise_lazy(xb, yb, mt.q, mt.tbl.ps, mt.pw_bound)


def _inv_mxu(blocks_in, refs, mt: MxuTables):
    """Full inverse NTT from lazy blocks (< mt.pw_bound — canonical
    inputs qualify, the standalone intt path); canonical blocks out."""
    blocks, rb = _block_matmul(blocks_in, refs["wi"], refs["consti"],
                               mt, mt.groups_i, mt.bounds_i, mt.inv_off,
                               mt.Di, mt.inv_base)
    # reduce lazy recombination sums into [0, 2q) — by the cheapest route
    # the emission's own output bound allows
    blocks = [reduce_bounded_2q(v, rb, mt.q, mt.tbl.ps.one_shoup)
              for v in blocks]
    if mt.Lr:
        return _inv_rolls(blocks, mt)
    return [_csub(v, mt.q) for v in blocks]


# ----------------------------------------------------------------------
# Pallas kernels + callers.
# ----------------------------------------------------------------------

def _table_inputs(mt: MxuTables, want_fwd: bool, want_inv: bool):
    """(ordered names, arrays, specs) for the kernel's table operands."""
    names, arrs = [], []

    def add(nm, a):
        names.append(nm)
        arrs.append(jnp.asarray(a))

    if want_fwd:
        add("wf", mt.wf)
        add("constf", mt.constf)
    if want_inv:
        add("wi", mt.wi)
        add("consti", mt.consti)
    specs = [pl.BlockSpec(a.shape, (lambda *_, nd=a.ndim: (0,) * nd),
                          memory_space=pltpu.VMEM) for a in arrs]
    return names, arrs, specs


def _make_runner(kernel, mt: MxuTables, num_tensor_in: int, names, arrs,
                 tab_specs, tile_b: int, interpret: bool,
                 num_bcast_in: int = 0):
    """Batch-tiled pallas_call runner.  The first `num_tensor_in` arguments
    are (B, n) operands tiled over the grid; the next `num_bcast_in` are
    (1, n) rows broadcast to every tile (fixed-operand spectra); the
    precomputed tables follow."""
    n = mt.n

    def run(*tensors):
        bcast = tensors[num_tensor_in:]
        tensors = tensors[:num_tensor_in]
        B = tensors[0].shape[0]
        # small batches use a smaller tile instead of padding up to the
        # full one (the reference's shipped config is BATCH=2, main.cuh:7)
        tb = min(tile_b, max(8, 1 << (B - 1).bit_length()))
        pad = (-B) % tb
        if pad:
            tensors = tuple(jnp.pad(v, ((0, pad), (0, 0))) for v in tensors)
        Bp = B + pad
        tens_specs = [pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(num_tensor_in)]
        tens_specs += [pl.BlockSpec((1, n), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)
                       for _ in range(num_bcast_in)]
        kwargs = {}
        if not interpret:
            # the resident digit tables are double-buffered by the pipeline;
            # raise the scoped-vmem cap beyond the conservative 16MB default
            # for the large-n / 4-digit parameter sets
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // tb,),
            in_specs=tens_specs + tab_specs,
            out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.uint32),
            interpret=interpret,
            **kwargs,
        )(*tensors, *bcast, *arrs)
        return out[:B] if pad else out

    return run


def _flatten_batch(run, n: int):
    """Wrap a (B, n)->(B, n) runner to accept arbitrary leading axes
    (including none), matching the jnp pipelines' batching contract."""
    def fn(*tensors):
        shape = tensors[0].shape
        flat = tuple(v.reshape(-1, n) for v in tensors)
        out = run(*flat)
        return out.reshape(shape)
    return fn


def _tile_b(mt: MxuTables, requested: int | None,
            planes: int | None = None) -> int:
    if requested:
        return requested
    # Fit tile-dependent buffers (x/y/z + lazy temps + digit planes,
    # ~32 bytes/coeff empirically) plus the resident digit tables in a
    # 20 MB working budget (the compiler cap is raised to 64 MB in
    # _make_runner; 20 MB lands on the measured-optimal tiles: 256 for
    # n<=1024, 128 for n=2048).  tile_b=256 measured fastest for n=1024
    # on v5e (sweep 64..512, 2026-08).
    # `planes` = resident table plane count: Df+Di for the full polymul
    # kernels, Df or Di alone for the one-direction transforms
    tables = (planes or mt.Df + mt.Di) * mt.nb * mt.bw * (mt.D * mt.bw)
    avail = 20 * 1024 * 1024 - tables
    # very large table sets (n=8192: 22 MB of digit matrices) would zero
    # the tile budget; the compiler cap is 64 MB, so grant a 6 MB
    # tile-buffer floor instead of collapsing to tb=8
    avail = max(avail, 6 * 1024 * 1024)
    cap = avail // (32 * mt.n)
    tb = 8
    while tb * 2 <= min(cap, 256):
        tb *= 2
    return tb


@functools.lru_cache(maxsize=None)
def polymul_mxu_fn(name: str, tile_b: int | None = None,
                   interpret: bool = False, bw: int | None = None):
    """Jitted MXU-matmul negacyclic polymul: (B, n) x (B, n) -> (B, n),
    bit-identical to algo='merged'/'fused'."""
    mt = get_mxu_tables(name, bw)
    ps = mt.tbl.ps
    names, arrs, specs = _table_inputs(mt, True, True)

    def kernel(*refs):
        x_ref, y_ref = refs[0], refs[1]
        z_ref = refs[-1]
        tab = dict(zip(names, refs[2:-1]))
        X = _fwd_mxu(_split_blocks(x_ref, mt), tab, mt)
        Y = _fwd_mxu(_split_blocks(y_ref, mt), tab, mt)
        Z = [_pointwise(xb, yb, mt) for xb, yb in zip(X, Y)]
        _store_blocks(z_ref, _inv_mxu(Z, tab, mt), mt)

    run = _flatten_batch(_make_runner(kernel, mt, 2, names, arrs, specs,
                                      _tile_b(mt, tile_b), interpret), mt.n)

    def fn(x, y):
        return run(jnp.asarray(x, jnp.uint32), jnp.asarray(y, jnp.uint32))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def polymul_fixed_mxu_fn(name: str, tile_b: int | None = None,
                         interpret: bool = False, bw: int | None = None):
    """Jitted fixed-operand negacyclic polymul: (B, n) x spectrum (n,) ->
    (B, n).  The second operand's forward NTT is precomputed once (use
    ntt_mxu_fn / models.ntt), so each product costs one forward + one
    inverse transform and streams only x and z — the qTESLA
    verification-shaped workload (fixed public polynomial a)."""
    mt = get_mxu_tables(name, bw)
    names, arrs, specs = _table_inputs(mt, True, True)
    n = mt.n

    def kernel(*refs):
        x_ref, yspec_ref = refs[0], refs[1]
        z_ref = refs[-1]
        tab = dict(zip(names, refs[2:-1]))
        X = _fwd_mxu(_split_blocks(x_ref, mt), tab, mt)
        Z = [_pointwise(xb, yspec_ref[:, b * mt.bw:(b + 1) * mt.bw], mt)
             for b, xb in enumerate(X)]
        _store_blocks(z_ref, _inv_mxu(Z, tab, mt), mt)

    run = _make_runner(kernel, mt, 1, names, arrs, specs,
                       _tile_b(mt, tile_b), interpret, num_bcast_in=1)

    def fn(x, yspec):
        x = jnp.asarray(x, jnp.uint32)
        shape = x.shape
        out = run(x.reshape(-1, n),
                  jnp.asarray(yspec, jnp.uint32).reshape(1, n))
        return out.reshape(shape)

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def ntt_mxu_fn(name: str, tile_b: int | None = None,
               interpret: bool = False, bw: int | None = None):
    """Jitted forward NTT (canonical out), bit-identical to ntt_fwd_merged."""
    mt = get_mxu_tables(name, bw)
    names, arrs, specs = _table_inputs(mt, True, False)

    def kernel(*refs):
        x_ref, out_ref = refs[0], refs[-1]
        tab = dict(zip(names, refs[1:-1]))
        X = _fwd_mxu(_split_blocks(x_ref, mt), tab, mt)
        X = [_csub(_reduce_2q(xb, mt), mt.q) for xb in X]
        _store_blocks(out_ref, X, mt)

    run = _flatten_batch(_make_runner(kernel, mt, 1, names, arrs, specs,
                                      _tile_b(mt, tile_b, mt.Df),
                                      interpret), mt.n)
    return jax.jit(lambda x: run(jnp.asarray(x, jnp.uint32)))


@functools.lru_cache(maxsize=None)
def intt_mxu_fn(name: str, tile_b: int | None = None,
                interpret: bool = False, bw: int | None = None):
    """Jitted inverse NTT, bit-identical to intt_inv_merged."""
    mt = get_mxu_tables(name, bw)
    names, arrs, specs = _table_inputs(mt, False, True)

    def kernel(*refs):
        x_ref, out_ref = refs[0], refs[-1]
        tab = dict(zip(names, refs[1:-1]))
        _store_blocks(out_ref, _inv_mxu(_split_blocks(x_ref, mt), tab, mt),
                      mt)

    run = _flatten_batch(_make_runner(kernel, mt, 1, names, arrs, specs,
                                      _tile_b(mt, tile_b, mt.Di),
                                      interpret), mt.n)
    return jax.jit(lambda x: run(jnp.asarray(x, jnp.uint32)))


# ----------------------------------------------------------------------
# Fixed-operand constant folding: the pointwise diagonal folded into the
# inverse block matrices.
# ----------------------------------------------------------------------

class _FixedFoldPlan:
    """Static digit/recombination plan for the folded fixed-operand kernel
    (pure data holder; built once per parameter set by fixed_fold_plan)."""

    __slots__ = ("base", "Din", "Dout", "groups", "bounds", "off",
                 "in_bound", "fwd_out", "canon", "mw_wc", "out_bound")

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


@functools.lru_cache(maxsize=None)
def fixed_fold_plan(name: str, bw: int | None = None) -> _FixedFoldPlan:
    """Plan for folding a constant spectrum's diagonal into the inverse
    block matmul (the fixed-operand serving path): with a constant second
    operand a, z = INTT(X^ * A^) = InvRolls(M_inv' @ X^) where
    M_inv' = M_inv @ diag(A^) per 128-lane block — the pointwise stage
    disappears entirely (the reference's pointwise_mult, NTT.cu:1155-1160,
    becomes a free column scaling of constant matrices).

    M_inv' depends on the runtime constant, so the digit/class plan is
    computed HERE from worst-case matrix digit maxima (any entries mod q):
    every constant then shares ONE compiled kernel, and fixed_fold_tables
    only fills in W'/const' arrays (runtime operands) under this plan.

    Two input-split candidates are costed with the same static model the
    flagship tables use (_plan_cost): LAZY (split the forward matmul's raw
    lazy output directly — usually one extra digit plane) vs CANON
    (canonicalize the forward output first, then the minimal split)."""
    mt = get_mxu_tables(name, bw)
    q, bwv = mt.q, mt.bw
    Dout = _ndigits(q)
    down = _reduce_kind(q)
    fwd_out = _recombine_bound(mt.groups_f, mt.bounds_f, q)
    # worst-case per-plane |digit| of ANY centered matrix entry mod q
    # (identical for every input plane i: 2^{8i}K mod q spans the same
    # centered range) — _input_digit_maxima mirrors _balanced_digits'
    # biased extraction exactly
    wcm = _input_digit_maxima(Dout, q >> 1, q, 256)
    best = None
    for in_bound, canon in ((fwd_out, False), (q, True)):
        for base in (256, 128):
            Din = _plane_count(in_bound, base)
            if Din is None:
                continue
            mw = np.tile(np.asarray(wcm, np.int64), (Din, 1))
            bounds = _digit_bounds(
                mw, bwv, _input_digit_maxima(Din, in_bound >> 1,
                                             in_bound, base))
            try:
                groups = _plan_groups(bounds, q, down)
            except ValueError:
                continue
            (sh, cs, ng), _ = _plan_cost(groups, bounds, q, down)
            cost = (_COST_SHOUP * sh + _COST_CSUB * cs
                    + (_COST_PLANE + Dout) * Din)
            if canon:
                # pre-split canonicalization of the forward output —
                # mirror of reduce_bounded_2q's route + one csub to q
                if fwd_out <= 2 * q:
                    cost += _COST_CSUB
                elif fwd_out <= 16 * q:
                    cost += _COST_CSUB * (
                        _chain_csubs(fwd_out, 2 * q, q) + 1)
                elif down == "reduce_sparse":
                    cost += 4 * _COST_CSUB
                else:
                    cost += _COST_SHOUP + 2 * _COST_CSUB
            key = (cost, ng)
            if best is None or key < best[0]:
                best = (key, _FixedFoldPlan(
                    base=base, Din=Din, Dout=Dout, groups=tuple(groups),
                    bounds=tuple(bounds), off=in_bound >> 1,
                    in_bound=in_bound, fwd_out=fwd_out, canon=canon,
                    mw_wc=tuple(wcm),
                    out_bound=_recombine_bound(groups, bounds, q)))
    if best is None:
        raise ValueError(
            f"{name}: no digit split covers the fixed-fold input bounds")
    return best[1]


def fixed_fold_tables(name: str, spectrum, bw: int | None = None):
    """Per-constant folded inverse tables (host-exact numpy): `spectrum` is
    the CANONICAL forward NTT of the constant polynomial, (n,) uint32 in
    the kernel's (merged) output order — use ntt_mxu_fn / models.ntt.
    Scales the columns of the exact inverse block matrices by the spectrum
    (M' = M_inv @ diag(A^) mod q) and digit-decomposes them under the
    shared worst-case plan.  Returns (W, const) arrays for
    polymul_fixed_folded_mxu_fn."""
    mt = get_mxu_tables(name, bw)
    fp = fixed_fold_plan(name, bw)
    q, bwv, nb = mt.q, mt.bw, mt.nb
    d = np.asarray(spectrum)
    if d.shape != (mt.n,):
        raise ValueError(f"spectrum must be ({mt.n},), got {d.shape}")
    d = d.astype(object) % q
    Mi = _inv_matrix(mt.tbl, mt.logn - mt.Lr).astype(object)
    M = (Mi * d[None, :]) % q          # scale COLUMNS: M_inv @ diag(A^)
    W = np.zeros((nb, fp.Din, bwv, fp.Dout * bwv), dtype=np.int8)
    const = np.zeros((nb, 1, bwv), dtype=np.uint32)
    mw = np.zeros((fp.Din, fp.Dout), dtype=np.int64)
    for b in range(nb):
        Mb = M[b * bwv:(b + 1) * bwv, b * bwv:(b + 1) * bwv]
        W[b], colsum = _matrix_digit_block(Mb.T, q, fp.Din, fp.Dout, mw,
                                           fp.base)
        const[b, 0, :] = _const_row(colsum, fp.off, fp.groups, fp.bounds, q)
    # plan soundness: the actual digit maxima must sit inside the
    # worst-case maxima the shared plan was sized for
    assert (mw <= np.asarray(fp.mw_wc, np.int64)[None, :]).all(), \
        "folded-matrix digits exceed the worst-case plan"
    return jnp.asarray(W), jnp.asarray(const)


@functools.lru_cache(maxsize=None)
def polymul_fixed_folded_mxu_fn(name: str, tile_b: int | None = None,
                                interpret: bool = False,
                                bw: int | None = None):
    """Jitted folded fixed-operand negacyclic polymul:
    (B, n) x fixed_fold_tables(name, A^) -> (B, n).  The constant's
    pointwise diagonal lives inside the inverse matmul tables, so the
    kernel is forward -> inverse with NO pointwise stage; bit-identical
    to polymul_fixed_mxu_fn / algo='merged'."""
    mt = get_mxu_tables(name, bw)
    fp = fixed_fold_plan(name, bw)
    q = mt.q
    one_shoup = mt.tbl.ps.one_shoup
    names, arrs, specs = _table_inputs(mt, True, False)   # fwd tables only
    n = mt.n
    rb_static = fp.out_bound

    def kernel(*refs):
        x_ref, wI_ref, cI_ref = refs[0], refs[1], refs[2]
        z_ref = refs[-1]
        tab = dict(zip(names, refs[3:-1]))
        blocks = _split_blocks(x_ref, mt)
        if mt.Lr:
            blocks = _fwd_rolls(blocks, mt)
        blocks, fb = _block_matmul(blocks, tab["wf"], tab["constf"], mt,
                                   mt.groups_f, mt.bounds_f, mt.fwd_off,
                                   mt.Df, mt.fwd_base)
        assert fb == fp.fwd_out, "forward bound drifted from the fold plan"
        if fp.canon:
            blocks = [_csub(reduce_bounded_2q(v, fp.fwd_out, q, one_shoup),
                            q) for v in blocks]
        outs = [_one_block_matmul(
            _digit_planes(blk, fp.off, fp.Din, fp.base), b, wI_ref, cI_ref,
            mt, fp.groups, fp.bounds, fp.Din)
            for b, blk in enumerate(blocks)]
        assert outs[0][1] == rb_static, "fold recombination bound drifted"
        blocks = [reduce_bounded_2q(v, rb_static, q, one_shoup)
                  for v, _ in outs]
        if mt.Lr:
            blocks = _inv_rolls(blocks, mt)
        else:
            blocks = [_csub(v, q) for v in blocks]
        _store_blocks(z_ref, blocks, mt)

    tile = _tile_b(mt, tile_b, mt.Df + fp.Din)

    def run(x, W, c):
        B = x.shape[0]
        tb = min(tile, max(8, 1 << (B - 1).bit_length()))
        pad = (-B) % tb
        if pad:
            x = jnp.pad(x, ((0, pad), (0, 0)))
        Bp = B + pad
        fold_specs = [pl.BlockSpec(a.shape,
                                   (lambda *_, nd=a.ndim: (0,) * nd),
                                   memory_space=pltpu.VMEM)
                      for a in (W, c)]
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // tb,),
            in_specs=[pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)]
            + fold_specs + specs,
            out_specs=pl.BlockSpec((tb, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.uint32),
            interpret=interpret,
            **kwargs,
        )(x, W, c, *arrs)
        return out[:B] if pad else out

    def fn(x, W, c):
        x = jnp.asarray(x, jnp.uint32)
        shape = x.shape
        out = run(x.reshape(-1, n), jnp.asarray(W), jnp.asarray(c))
        return out.reshape(shape)

    return jax.jit(fn)
