"""MXU-fast local compute for the sharded four-step polymul, built on the
flagship kernel's wide-stage + 128-block-matmul split.

Round 2 ran each local column/row transform as ONE dense per-device
(nloc x nloc) digit-matmul — O(nloc) MACs per coefficient, a hard
`nloc <= 512` cap, and a ~3.3x per-chip tax over the flagship kernel
(round-2 VERDICT item 1).  This rebuild decomposes every local transform
exactly the way ops/ntt_mxu.py decomposes the full-size one:

  - The n1-point COLUMN transform on the (B, n1, n2k) local shard is the
    *negacyclic* n1-point NTT with psi1 = psi^n2 (the psi^(j1*n2) part of
    the four-step's phi weighting IS the merged-psi weighting of the
    sub-transform; psi1 equals the (n1, q) subtable's own psi because both
    are g^((q-1)/(2*n1)) for the same smallest generator g — asserted at
    plan build).  Its stages with j1-distance >= Bk = TW/n2k pair whole
    (TB, TW) tiles of the flat local layout, so they run as the flagship's
    wide VPU stages (_fwd_rolls/_inv_rolls, scalar Shoup twiddles, Harvey
    laziness); the log2(Bk) remaining stages are tile-local and fold into
    per-(device, tile) TW x TW matrices together with
      * the psi^j2g lane diagonal (lane-only, commutes with the lane-
        preserving wide stages),
      * the w^(k1*j2g) four-step twiddle (output-side, folded via the
        merged forward's position->k1 map), and
      * psi^{-j2g} on the inverse side.
  - The n2-point ROW transforms (segment 2) pack TW/n2 rows per 128-lane
    block: forward = one SHARED block-diagonal kron(I, R2) matrix,
    inverse = per-(device, block) matrices with w^(-k1*j2) folded per row.
  - Segment interfaces are LAZY: each matmul's Horner-packed recombination
    output (bound tracked statically, _recombine_bound) is stored and
    all_to_all'd unreduced; the consumer's digit split simply covers the
    lazy bound with (possibly) one extra int8 plane — the flagship's
    Df = D+1 trick applied across kernel/collective boundaries.  Only the
    pointwise (any-uint32 Barrett) and the final inverse wide stages
    canonicalize.

Per-chip cost is now ~ (nloc/n) x the flagship kernel plus the extra HBM
passes the all_to_all boundaries force, for ANY nloc (the _MAX_DENSE cap
is gone; nloc < 128 degenerates to a single dense tile).

Layout contract with parallel/sharded.py is unchanged at the a2a
boundaries ((B, n1, n2k) coefficient / (B, n1k, n2) spectral, same
lax.all_to_all axes) except that the spectral row ORDER is the merged
forward's internal position order instead of natural k1 — a private
relabeling between seg1/seg2/seg3, invisible in the final result, which
stays bit-exact vs the jnp path and the single-chip pipelines
(tests/test_sharded.py).

Reference analog: NTT.cu:767-802 (the four-step GPU kernel) — there a
single-device curiosity; here the multi-chip perf path (SURVEY.md §2.4
four-step row, hard part #3).
"""

from __future__ import annotations

import functools
import types

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import ntt as N
from ..ops.ntt import _subtables
from ..ops.ntt_mxu import (_COST_CSUB, _COST_PLANE, _COST_PLANE_EXTRA,
                           _COST_SHOUP,
                           _chain_csubs, _const_row, _csub, _digit_bounds,
                           _digit_planes, _fwd_matrix, _fwd_rolls,
                           _group_bound,
                           _input_digit_maxima, _inv_matrix, _inv_rolls,
                           _lazy_fwd_schedule, _matrix_digit_block,
                           _ndigits, _plan_cost, _plan_groups,
                           _plane_count, _recombine_bound,
                           _recombine_classes, _reduce_kind,
                           pointwise_bound, pointwise_lazy,
                           reduce_bounded_2q)
from ..ops.tables import NttTables, get_tables

__all__ = ["polymul_fourstep_mxu_fn", "polymul_fixed_fourstep_mxu_fn",
           "polymul_fixed_folded_fourstep_mxu_fn", "fourstep_fold_tables",
           "fourstep_mxu_plans", "local_pipeline_fn",
           "polymul_fourstep_mxu_classes_fn", "class_boundary_plan",
           "local_pipeline_classes_fn"]


class _RollTables:
    """Duck-typed slice of ops.ntt_mxu.MxuTables for the wide-stage engines
    (_fwd_rolls/_inv_rolls) running the n1-point sub-transform over
    (TB, TW) tiles of the flat SP local layout: `bw` counts transform
    values per tile (Bk), `tbl` is the (n1, q) subtable whose merged-psi
    stage tables carry psi1 = psi^n2."""

    def __init__(self, sub_tbl: NttTables, Lr: int, Bk: int):
        self.tbl = sub_tbl
        self.q = sub_tbl.q
        self.logn = sub_tbl.logn
        self.Lr = Lr
        self.bw = Bk
        self.fwd_sched, bnd = _lazy_fwd_schedule(self.q, Lr)
        self.lazy_bound = bnd
        self.lazy_coverable = _plane_count(bnd) is not None
        # provisional: fourstep_mxu_plans cost-compares against the
        # canonical chain-then-split fallback once K1 exists (the same
        # comparison MxuTables runs) and overwrites these
        self.set_fwd(self.lazy_coverable)

    def set_fwd(self, lazy: bool) -> None:
        """Pick the forward handoff _fwd_rolls emits: lazy (digit split
        covers the wide-stage output bound directly) or canonical (csub
        chain to < q first)."""
        self.fwd_lazy = lazy and self.lazy_coverable
        self.fwd_bound = self.lazy_bound if self.fwd_lazy else self.q
        self.fwd_off = self.fwd_bound >> 1


def _transform_matrix(sub_tbl, inverse: bool) -> np.ndarray:
    """(m, m) object-int matrix R with y = x @ R == stockham_{fwd,inv} on
    the last axis (the exact jnp sub-transform, including its n^{-1} when
    inverse) — built by pushing the identity basis through the real code."""
    m = sub_tbl.n
    eye = np.eye(m, dtype=np.uint32)
    if inverse:
        out = np.asarray(N.stockham_inv(jnp.asarray(eye), sub_tbl))
    else:
        out = np.asarray(N.stockham_fwd(jnp.asarray(eye), sub_tbl))
    return out.astype(object)


def _k1_position_map(sub_tbl: NttTables) -> np.ndarray:
    """pos -> k1: which cyclic-NTT output index the merged-psi forward
    emits at each position (out[pos] = sum_j psi1^j omega1^(j*k1) x[j]),
    derived from the exact stage-composition matrix and verified against a
    second column."""
    q, n1 = sub_tbl.q, sub_tbl.n
    psi1, om1 = int(sub_tbl.ps.psi), int(sub_tbl.ps.omega)
    F1 = _fwd_matrix(sub_tbl, 0)              # out = F1 @ x, exact mod q
    dlog = {}
    v = psi1 % q
    for t in range(n1):
        dlog[v] = t
        v = (v * om1) % q
    k1map = np.array([dlog[int(F1[p, 1]) % q] for p in range(n1)],
                     dtype=np.int64)
    if n1 > 2:
        psi2 = psi1 * psi1 % q
        for p in range(n1):
            want = psi2 * pow(om1, 2 * int(k1map[p]), q) % q
            assert int(F1[p, 2]) % q == want, "k1 map inconsistent"
    return k1map


def _digit_plan(Ms: np.ndarray, q: int, one_shoup: int, in_bound: int,
                downstream: str = "any", reduce_uncoverable: bool = True,
                bases: tuple = (256, 128)):
    """Digit-matmul tables for a stack of exact input-major mod-q matrices
    sharing ONE recombination plan (groups/bounds worst-case over the
    stack, so a single compiled kernel serves every device/tile).

    `in_bound`: the operand's LAZY bound (q for canonical input); the
    digit split centers at in_bound//2 and uses the smallest covering
    plane count at the searched base, candidates costed with the shared
    static model (_plan_cost), cheapest taken.  Because the SP segment
    kernels have little or no wide-stage VPU work for the MXU dots to
    hide behind (at k=8, none), candidates pay ntt_mxu._COST_PLANE_EXTRA
    for every digit plane beyond the minimal covering count among the
    candidates — the term the round-3b measurement demanded: the
    un-penalized model ranked base-128 (Din=5) cheaper by one csub for
    qtesla-iii-speed's seg3, and the kernel ran 7-19% slower at k=4/8
    (0.353->0.379 / 0.224->0.266 ms, 2026-08-18), while the round-4
    fixed-fold A/B at EQUAL plane count showed base-128 slightly FASTER
    — so the penalty is per extra plane, not per base
    (docs/PERF_NOTES.md round-4 entry).  With it, the full (256, 128)
    search is on by default and ranks base-256 first for that seg3 case
    (tests/test_sharded.py asserts it).  The plan's recombination output
    bound is computed statically (raw_bound); when `reduce_uncoverable`
    and no split could cover it downstream, the kernel reduces to
    [0, 2q) before storing (store_bound reflects whichever applies)."""
    bw = Ms.shape[-1]
    lead = Ms.shape[:-2]
    Dout = _ndigits(q)
    off = in_bound >> 1
    indices = list(np.ndindex(*lead)) if lead else [()]
    din_min = min((d for d in (_plane_count(in_bound, b) for b in bases)
                   if d is not None), default=None)
    if din_min is None:
        raise ValueError(f"lazy bound {in_bound} uncoverable at any base")
    best = None
    for base in bases:
        din = _plane_count(in_bound, base)
        if din is None:
            continue
        W = np.zeros(lead + (din, bw, Dout * bw), dtype=np.int8)
        colsums = np.zeros(lead + (bw,), dtype=object)
        mw = np.zeros((din, Dout), dtype=np.int64)
        for idx in indices:
            W[idx], colsums[idx] = _matrix_digit_block(Ms[idx], q, din,
                                                       Dout, mw,
                                                       in_base=base)
        bounds = _digit_bounds(
            mw, bw, _input_digit_maxima(din, off, in_bound, base))
        try:
            groups = _plan_groups(bounds, q, downstream)
        except ValueError:
            continue                 # no feasible grouping at this base
        (sh, cs, ng), _ = _plan_cost(groups, bounds, q, downstream)
        cost = (_COST_SHOUP * sh + _COST_CSUB * cs
                + (_COST_PLANE + Dout) * din
                + _COST_PLANE_EXTRA * (din - din_min), ng)
        if best is None or cost < best[0]:
            best = (cost, base, din, W, colsums, bounds, groups)
    if best is None:
        raise ValueError(f"lazy bound {in_bound} uncoverable at any base")
    _, base, din, W, colsums, bounds, groups = best
    const = np.zeros(lead + (1, bw), dtype=np.uint32)
    for idx in indices:
        const[idx + (0,)] = _const_row(colsums[idx], off, groups, bounds, q)
    raw_bound = _recombine_bound(groups, bounds, q)
    needs_reduce = reduce_uncoverable and _plane_count(raw_bound) is None
    store_bound = 2 * q if needs_reduce else raw_bound
    return types.SimpleNamespace(
        W=W, const=const, groups=groups, bounds=bounds, bw=bw, din=din,
        off=off, base=base, q=q, one_shoup=one_shoup, raw_bound=raw_bound,
        needs_reduce=needs_reduce, store_bound=store_bound)


@functools.lru_cache(maxsize=None)
def fourstep_mxu_plans(name: str, n1: int, k: int):
    """All wide-stage schedules, block matrices and digit plans for one
    (param set, split, mesh-model size).  Layout contract at the a2a
    boundaries is parallel/sharded.py's; spectral rows are internally in
    the merged forward's position order (see module docstring)."""
    from .sharded import _fourstep_tables
    tbl = get_tables(name)
    n, q = tbl.n, tbl.q
    n2 = n // n1
    if n1 % k or n2 % k:
        raise ValueError(
            f"model axis {k} must divide both n1={n1} and n2={n2}")
    if n2 > 128:
        raise ValueError(
            f"row transform n2={n2} exceeds one 128-lane vreg; pick a "
            f"larger n1 so the MXU SP path applies (or use local='jnp')")
    n2k, n1k = n2 // k, n1 // k
    nloc = n1 * n2k
    TW = min(128, nloc)            # tile width in lanes
    A = nloc // TW                 # tiles per local shard
    Bk = TW // n2k                 # j1 values per tile
    L1 = n1.bit_length() - 1
    Lr = A.bit_length() - 1        # wide (tile-pairing) stages
    t1 = _subtables(name, n1)
    t2 = _subtables(name, n2)
    # the folding identities the construction relies on (same smallest
    # generator => compatible sub-roots; holds for every valid (n, q))
    assert int(t1.ps.psi) == pow(int(tbl.ps.psi), n2, q), "psi1 != psi^n2"
    assert int(t2.ps.omega) == pow(int(tbl.ps.omega), n1, q)
    one_shoup = tbl.ps.one_shoup
    rolls = _RollTables(t1, Lr, Bk)
    T = _fourstep_tables(name, n1)
    phi_lane = tbl.phi.astype(object)        # psi^i     (index by j2g)
    ipsi_lane = tbl.ipsi_pow.astype(object)  # psi^{-i}
    W = T["W"].astype(object)                # (n1, n2)  omega^(k1*j2)
    Winv = T["Winv"].astype(object)
    k1map = _k1_position_map(t1)
    Mf = _fwd_matrix(t1, Lr)                 # stages Lr..L1 (tile-local)
    Mi = _inv_matrix(t1, L1 - Lr)            # stages 0..L1-Lr (tile-local)
    R2 = _transform_matrix(t2, inverse=False)
    R2i = _transform_matrix(t2, inverse=True)

    # ---- segments 1/3: per-(device, tile) TW x TW input-major matrices.
    # In-tile index = (j1-within-tile b) * n2k + lane j2l; the j2 diagonals
    # are lane-only so every entry keeps the delta_{j2l} structure.
    for t in range(A):
        for M, tag in ((Mf, "fwd"), (Mi, "inv")):
            row = M[t * Bk:(t + 1) * Bk].copy()
            row[:, t * Bk:(t + 1) * Bk] = 0
            assert not row.any(), f"{tag} in-tile stages not tile-local"
    K1 = np.zeros((k, A, TW, TW), dtype=object)
    K3 = np.zeros((k, A, TW, TW), dtype=object)
    for d in range(k):
        for t in range(A):
            for c in range(Bk):
                p = t * Bk + c
                k1 = int(k1map[p])
                for b in range(Bk):
                    mf = int(Mf[p, t * Bk + b]) % q
                    mi = int(Mi[p, t * Bk + b]) % q
                    for lam in range(n2k):
                        j2g = d * n2k + lam
                        i, o = b * n2k + lam, c * n2k + lam
                        if mf:
                            K1[d, t, i, o] = (int(phi_lane[j2g]) * mf % q
                                              * int(W[k1, j2g])) % q
                        if mi:
                            K3[d, t, i, o] = mi * int(ipsi_lane[j2g]) % q

    # ---- segment 2: R = TW/n2 rows of n2 lanes per block; forward is one
    # SHARED block-diagonal kron(I_R, R2); inverse folds w^(-k1*j2) per
    # row, k1 = k1map[global row position].
    R = TW // n2
    K2f = np.zeros((TW, TW), dtype=object)
    for rho in range(R):
        sl = slice(rho * n2, (rho + 1) * n2)
        K2f[sl, sl] = R2 % q
    K2i = np.zeros((k, A, TW, TW), dtype=object)
    for d in range(k):
        for bb in range(A):
            for rho in range(R):
                p = d * n1k + bb * R + rho
                sl = slice(rho * n2, (rho + 1) * n2)
                K2i[d, bb, sl, sl] = (R2i
                                      * Winv[int(k1map[p])][None, :]) % q

    pw_bound = pointwise_bound(q)
    # seg1 forward split: cost-compare lazy vs the canonical
    # chain-then-split fallback with the flagship's model (MxuTables /
    # _search_split) — the lazy extra input plane is not always cheaper
    # than the _fwd_rolls tail csub chain it deletes (code-review round 3:
    # the SP path used lazy-if-coverable unconditionally)
    candidates = []
    if rolls.lazy_coverable and rolls.lazy_bound > q:
        candidates.append((True, _digit_plan(K1, q, one_shoup,
                                             in_bound=rolls.lazy_bound), 0))
    candidates.append((False, _digit_plan(K1, q, one_shoup, in_bound=q),
                       _chain_csubs(rolls.lazy_bound, q, q)))

    din_floor = min(c[1].din for c in candidates)

    def p1_cost(p, extra_cs):
        # same extra-plane penalty as _digit_plan: in these kernels the
        # dots are not hidden, so the lazy split's extra plane must beat
        # the csub chain it deletes by more than its MAC/extraction cost
        (sh, cs, ng), _ = _plan_cost(p.groups, p.bounds, q, "any")
        return (_COST_SHOUP * sh + _COST_CSUB * (cs + extra_cs)
                + (_COST_PLANE + _ndigits(q)) * p.din
                + _COST_PLANE_EXTRA * (p.din - din_floor), ng)

    lazy_pick, p1, _ = min(candidates,
                           key=lambda c: p1_cost(c[1], c[2]))
    rolls.set_fwd(lazy_pick)
    p2f = _digit_plan(K2f, q, one_shoup, in_bound=p1.store_bound,
                      reduce_uncoverable=False)   # feeds the pointwise
    p2i = _digit_plan(K2i, q, one_shoup, in_bound=pw_bound)
    p3 = _digit_plan(K3, q, one_shoup, in_bound=p2i.store_bound,
                     downstream=_reduce_kind(q), reduce_uncoverable=False)

    # ---- fixed-operand fold plan (round-4): with a constant second
    # operand, segment 2 collapses to ONE per-(device, block) matmul
    # F = K2f @ diag(A^) @ K2i mod q (input-major composition; the
    # pointwise disappears into a column scaling of constant matrices —
    # the flagship's mxu-folded trick, ntt_mxu.fixed_fold_plan, applied
    # to the SP row segment).  F depends on the runtime constant, so the
    # digit/recombination plan is sized HERE for worst-case mod-q matrix
    # entries; every constant then shares one compiled kernel and
    # fourstep_fold_tables only fills in W/const under this plan.  Both
    # K2f and K2i are block-diagonal over the same n2-blocks, hence so is
    # F: class bounds use n2 (not TW) nonzero entries per output.
    Dout = _ndigits(q)
    wcm = _input_digit_maxima(Dout, q >> 1, q, 256)
    p2x = None
    for in_b, canon in ((p1.store_bound, False), (q, True)):
        if canon and p1.store_bound <= q:
            continue                   # input already canonical-or-better
        for base in (256, 128):
            din = _plane_count(in_b, base)
            if din is None:
                continue
            mw = np.tile(np.asarray(wcm, np.int64), (din, 1))
            bounds = _digit_bounds(
                mw, n2, _input_digit_maxima(din, in_b >> 1, in_b, base))
            try:
                groups = _plan_groups(bounds, q, "any")
            except ValueError:
                continue
            (sh, cs, ng), _ = _plan_cost(groups, bounds, q, "any")
            # flat per-plane surcharge: this kernel has no wide stages
            # for the dots to hide behind (same reasoning as
            # _COST_PLANE_EXTRA, but both candidates here may share a
            # din so charge every plane)
            cost = (_COST_SHOUP * sh + _COST_CSUB * cs
                    + (_COST_PLANE + Dout + _COST_PLANE_EXTRA) * din)
            if canon:
                cost += _COST_CSUB * (
                    _chain_csubs(p1.store_bound, q, q)
                    if p1.store_bound <= 16 * q else 4)
            raw = _recombine_bound(groups, bounds, q)
            needs_reduce = _plane_count(raw) is None
            key = (cost, ng)
            if p2x is None or key < p2x.cost_key:
                p2x = types.SimpleNamespace(
                    cost_key=key, base=base, din=din, off=in_b >> 1,
                    in_bound=in_b, canon=canon, bw=TW, q=q,
                    one_shoup=one_shoup, groups=tuple(groups),
                    bounds=tuple(bounds), mw_wc=mw.copy(), raw_bound=raw,
                    needs_reduce=needs_reduce,
                    store_bound=2 * q if needs_reduce else raw,
                    Dout=Dout)
    if p2x is None:
        raise ValueError(f"{name}: no digit split covers the SP fold")
    # the folded store bound differs from p2i's, so the inverse column
    # segment gets its own plan for the folded path
    p3x = _digit_plan(K3, q, one_shoup, in_bound=p2x.store_bound,
                      downstream=_reduce_kind(q), reduce_uncoverable=False)
    return types.SimpleNamespace(
        name=name, n=n, q=q, n1=n1, n2=n2, k=k, n1k=n1k, n2k=n2k,
        nloc=nloc, TW=TW, A=A, Bk=Bk, Lr=Lr, ps=tbl.ps, rolls=rolls,
        pw_bound=pw_bound, k1map=k1map, p1=p1, p2f=p2f, p2i=p2i, p3=p3,
        p2x=p2x, p3x=p3x, K1=K1, K2f=K2f, K2i=K2i)


# ----------------------------------------------------------------------
# Pallas kernels.
# ----------------------------------------------------------------------

def _runner(kernel, nloc: int, n_in: int, n_bcast: int, tile_b: int,
            interpret: bool, in_w: int | None = None,
            out_w: int | None = None):
    """Batch-tiled pallas_call over (Bl, in_w) local arrays + broadcast
    rows + whole-table inputs (mirrors ntt_mxu._make_runner).  Table
    arrays are passed at CALL time — under shard_map they are the
    device-local slices of the stacked per-device tables.  in_w/out_w
    default to nloc; the class-sum boundary kernels use Dout*nloc on one
    side (round 5)."""
    in_w = in_w or nloc
    out_w = out_w or nloc

    def run(*args):
        tensors = tuple(v.reshape(-1, in_w) for v in args[:n_in])
        bcast = tuple(v.reshape(1, in_w)
                      for v in args[n_in:n_in + n_bcast])
        tables = args[n_in + n_bcast:]
        B = tensors[0].shape[0]
        tile = min(tile_b, max(8, 1 << (B - 1).bit_length()))
        pad = (-B) % tile
        if pad:
            tensors = tuple(jnp.pad(v, ((0, pad), (0, 0))) for v in tensors)
        Bp = B + pad
        specs = [pl.BlockSpec((tile, in_w), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * n_in
        specs += [pl.BlockSpec((1, in_w), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)] * n_bcast
        specs += [pl.BlockSpec(t.shape, (lambda *_, nd=t.ndim: (0,) * nd),
                               memory_space=pltpu.VMEM) for t in tables]
        kwargs = {}
        if not interpret:
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // tile,),
            in_specs=specs,
            out_specs=pl.BlockSpec((tile, out_w), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, out_w), jnp.uint32),
            interpret=interpret,
            **kwargs,
        )(*tensors, *bcast, *tables)
        return out[:B] if pad else out

    return run


def _w_slices(w_ref, idx, din):
    return [w_ref[idx + (i,)] for i in range(din)]


def _apply_lazy(x_block, w_slices, const_row, plan):
    """(TB, TW) lazy-in [0, plan-in_bound) -> (TB, TW) lazy uint32 through
    one plan matrix; the traced bound must equal the planned one (the
    static mirror consumers were sized with)."""
    planes = _digit_planes(x_block, plan.off, plan.din, plan.base)
    lazy, rb = _recombine_classes(planes, w_slices, const_row, plan.bw,
                                  plan.q, plan.one_shoup, plan.groups,
                                  plan.bounds)
    assert rb == plan.raw_bound, "traced bound != planned bound"
    return lazy


def _make_seg1(plans, tile_b, interpret):
    """Column transform (phi-weighted n1-point NTT + W twiddle): wide
    tile-pairing stages then per-tile matmuls.  Canonical in, lazy out."""
    p = plans.p1
    TW, A = plans.TW, plans.A

    def kernel(x_ref, w_ref, c_ref, o_ref):
        blocks = [x_ref[:, t * TW:(t + 1) * TW] for t in range(A)]
        if plans.Lr:
            blocks = _fwd_rolls(blocks, plans.rolls)
        for t, blk in enumerate(blocks):
            lazy = _apply_lazy(blk, _w_slices(w_ref, (0, t), p.din),
                               c_ref[0, t], p)
            if p.needs_reduce:
                lazy = reduce_bounded_2q(lazy, p.raw_bound, p.q,
                                         p.one_shoup)
            o_ref[:, t * TW:(t + 1) * TW] = lazy

    return _runner(kernel, plans.nloc, 1, 0, tile_b, interpret)


def _seg2_block(x_sl, y_sl, bb, plans, wf_ref, cf_ref, wi_ref, ci_ref,
                y_is_spectrum: bool = False):
    """One 128-lane block of segment 2: lazy row-NTT of the operand(s)
    (y skipped when it is already a stored spectrum), any-uint32 Barrett
    pointwise, inverse row-NTT with Winv folded."""
    pf, pi = plans.p2f, plans.p2i
    ps, q = plans.ps, plans.q
    X = _apply_lazy(x_sl, _w_slices(wf_ref, (), pf.din), cf_ref[:], pf)
    Y = (y_sl if y_is_spectrum else
         _apply_lazy(y_sl, _w_slices(wf_ref, (), pf.din), cf_ref[:], pf))
    Z = pointwise_lazy(X, Y, q, ps, plans.pw_bound)
    lazy = _apply_lazy(Z, _w_slices(wi_ref, (0, bb), pi.din),
                       ci_ref[0, bb], pi)
    if pi.needs_reduce:
        lazy = reduce_bounded_2q(lazy, pi.raw_bound, q, ps.one_shoup)
    return lazy


def _make_seg2(plans, tile_b, interpret):
    TW, A = plans.TW, plans.A

    def kernel(x_ref, y_ref, wf_ref, cf_ref, wi_ref, ci_ref, o_ref):
        for bb in range(A):
            sl = slice(bb * TW, (bb + 1) * TW)
            o_ref[:, sl] = _seg2_block(x_ref[:, sl], y_ref[:, sl], bb,
                                       plans, wf_ref, cf_ref, wi_ref,
                                       ci_ref)

    return _runner(kernel, plans.nloc, 2, 0, tile_b, interpret)


def _make_seg2_fixed(plans, tile_b, interpret):
    """Fixed-operand segment 2: x rows vs a broadcast spectrum row (the
    spectrum is stored lazy; the pointwise accepts any uint32)."""
    TW, A = plans.TW, plans.A

    def kernel(x_ref, a_ref, wf_ref, cf_ref, wi_ref, ci_ref, o_ref):
        for bb in range(A):
            sl = slice(bb * TW, (bb + 1) * TW)
            o_ref[:, sl] = _seg2_block(x_ref[:, sl], a_ref[:, sl], bb,
                                       plans, wf_ref, cf_ref, wi_ref,
                                       ci_ref, y_is_spectrum=True)

    return _runner(kernel, plans.nloc, 1, 1, tile_b, interpret)


def _make_seg2_fwd_only(plans, tile_b, interpret):
    """Row-NTT forward blocks only — completes the spectrum for the
    fixed-operand prepare() (stored lazy, as the pointwise consumes it)."""
    pf = plans.p2f
    TW, A = plans.TW, plans.A

    def kernel(x_ref, wf_ref, cf_ref, o_ref):
        for bb in range(A):
            sl = slice(bb * TW, (bb + 1) * TW)
            o_ref[:, sl] = _apply_lazy(
                x_ref[:, sl], _w_slices(wf_ref, (), pf.din), cf_ref[:], pf)

    return _runner(kernel, plans.nloc, 1, 0, tile_b, interpret)


def _make_seg2_folded(plans, tile_b, interpret):
    """Folded fixed-operand segment 2 (round-4): ONE per-(device, block)
    matmul F = K2f @ diag(A^) @ K2i replaces row-fwd + pointwise + row-inv
    — plan p2x (worst-case, shared by every constant), per-constant W/const
    from fourstep_fold_tables."""
    p = plans.p2x
    TW, A, q = plans.TW, plans.A, plans.q

    def kernel(x_ref, w_ref, c_ref, o_ref):
        for t in range(A):
            blk = x_ref[:, t * TW:(t + 1) * TW]
            if p.canon:
                blk = _csub(reduce_bounded_2q(blk, plans.p1.store_bound,
                                              q, p.one_shoup), q)
            lazy = _apply_lazy(blk, _w_slices(w_ref, (0, t), p.din),
                               c_ref[0, t], p)
            if p.needs_reduce:
                lazy = reduce_bounded_2q(lazy, p.raw_bound, q, p.one_shoup)
            o_ref[:, t * TW:(t + 1) * TW] = lazy

    return _runner(kernel, plans.nloc, 1, 0, tile_b, interpret)


def fourstep_fold_tables(plans, spec_lazy):
    """Per-constant folded segment-2 tables (host-exact numpy, one-time
    per constant — the SP analog of ntt_mxu.fixed_fold_tables).
    `spec_lazy`: the device-major SP spectral layout of the constant's
    forward transform as STORED by seg2fwd (lazy uint32, (n,) or (k, nloc))
    — i.e. exactly what polymul_fixed_fourstep_mxu_fn's prepare() returns.
    Returns (W (k, A, din, TW, Dout*TW) int8, const (k, A, 1, TW) uint32)
    under the shared worst-case plan p2x."""
    p = plans.p2x
    q, TW, A, k, n2 = plans.q, plans.TW, plans.A, plans.k, plans.n2
    spec = (np.asarray(spec_lazy).astype(np.uint64).astype(object)
            .reshape(k, A * TW) % q)
    W = np.zeros((k, A, p.din, TW, p.Dout * TW), dtype=np.int8)
    const = np.zeros((k, A, 1, TW), dtype=np.uint32)
    mw = np.zeros((p.din, p.Dout), dtype=np.int64)
    R = TW // n2
    for d in range(k):
        for bb in range(A):
            dg = spec[d, bb * TW:(bb + 1) * TW]
            # F block-diagonal over the shared n2-blocks of K2f/K2i
            F = np.zeros((TW, TW), dtype=object)
            for rho in range(R):
                sl = slice(rho * n2, (rho + 1) * n2)
                F[sl, sl] = np.dot(plans.K2f[sl, sl] * dg[sl][None, :],
                                   plans.K2i[d, bb][sl, sl]) % q
            W[d, bb], colsum = _matrix_digit_block(F, q, p.din, p.Dout,
                                                   mw, in_base=p.base)
            const[d, bb, 0] = _const_row(colsum, p.off, p.groups,
                                         p.bounds, q)
    # plan soundness: actual digit maxima inside the worst-case plan, and
    # the n2-nonzero class-bound assumption (block-diagonality) holds
    assert (mw <= p.mw_wc).all(), \
        "folded-matrix digits exceed the worst-case SP plan"
    return W, const


def _make_seg3(plans, tile_b, interpret, plan=None):
    """Inverse column transform: per-tile matmuls (inverse in-tile stages
    + psi^{-j2} fold) then wide inverse stages.  Lazy in, canonical out.
    `plan` overrides the digit plan (p3x for the folded fixed path, whose
    store bound differs from p2i's)."""
    p = plan if plan is not None else plans.p3
    TW, A = plans.TW, plans.A
    q = plans.q

    def kernel(x_ref, w_ref, c_ref, o_ref):
        blocks = []
        for t in range(A):
            lazy = _apply_lazy(x_ref[:, t * TW:(t + 1) * TW],
                               _w_slices(w_ref, (0, t), p.din),
                               c_ref[0, t], p)
            blocks.append(reduce_bounded_2q(lazy, p.raw_bound, q,
                                            p.one_shoup))
        if plans.Lr:
            blocks = _inv_rolls(blocks, plans.rolls)
        else:
            blocks = [_csub(v, q) for v in blocks]
        for t, blk in enumerate(blocks):
            o_ref[:, t * TW:(t + 1) * TW] = blk

    return _runner(kernel, plans.nloc, 1, 0, tile_b, interpret)


# ----------------------------------------------------------------------
# Sharded assembly.
# ----------------------------------------------------------------------

def _default_tile(nloc: int) -> int:
    """Batch tile for the segment kernels, scaled so tile*nloc stays
    ~256K coefficients: small local shards (large model k) want LARGER
    tiles — measured on v5e at B=16k (round 3): k=8/nloc=128 runs 9%
    faster at tile 1024 than 256 (0.234 vs 0.258 ms), k=4 7% faster at
    1024, k=2 4% faster at 512; 2048 gains nothing over 1024."""
    return min(1024, max(256, (1 << 18) // nloc))


def _build(name: str, mesh: Mesh, n1: int | None, tile_b: int | None,
           interpret: bool, chunks: int = 1):
    tbl = get_tables(name)
    n = tbl.n
    if n1 is None:
        n1 = 1 << (tbl.logn // 2)
    k = mesh.shape["model"]
    plans = fourstep_mxu_plans(name, n1, k)
    n2, n2k, n1k, nloc = plans.n2, plans.n2k, plans.n1k, plans.nloc
    tb = tile_b or _default_tile(nloc)
    seg1 = _make_seg1(plans, tb, interpret)
    seg2 = _make_seg2(plans, tb, interpret)
    seg2f = _make_seg2_fixed(plans, tb, interpret)
    seg2fwd = _make_seg2_fwd_only(plans, tb, interpret)
    seg3 = _make_seg3(plans, tb, interpret)

    def a2a_fwd(v3):       # (Bl, n1, n2k) -> (Bl, n1k, n2)
        return lax.all_to_all(v3, "model", split_axis=1, concat_axis=2,
                              tiled=True)

    def a2a_inv(v3):       # (Bl, n1k, n2) -> (Bl, n1, n2k)
        return lax.all_to_all(v3, "model", split_axis=2, concat_axis=1,
                              tiled=True)

    def fwd_to_spectral(xl, w1, c1):
        B = xl.shape[0]
        v = seg1(xl.reshape(B, nloc), w1, c1)
        return a2a_fwd(v.reshape(B, plans.n1, n2k)).reshape(B, nloc)

    def local_polymul(xl, yl, w1, c1, wf, cf, wi, ci, w3, c3):
        # xl, yl: (Bl, n1, n2k) coefficient-layout local shards.  With
        # chunks > 1 the batch is split so chunk i's all_to_all is
        # independent of chunk j's kernels — XLA's async collectives can
        # then hide the ICI exchange behind neighbouring compute
        # (SURVEY.md hard part #3; unobservable on one chip, validated
        # bit-exact on the CPU mesh).
        B = xl.shape[0]
        nch = chunks if chunks > 1 and B % chunks == 0 else 1
        xcs = jnp.split(xl.reshape(B, nloc), nch)
        ycs = jnp.split(yl.reshape(B, nloc), nch)
        # two single-output seg1 calls measured faster than one fused
        # 2-in-2-out kernel (0.857 vs 0.931 ms at B=16k, k=4 — the extra
        # live buffers hurt the pipeline)
        vs = [(seg1(xc, w1, c1), seg1(yc, w1, c1))
              for xc, yc in zip(xcs, ycs)]
        ws = []
        for vx, vy in vs:
            bc = vx.shape[0]
            vx = a2a_fwd(vx.reshape(bc, plans.n1, n2k)).reshape(bc, nloc)
            vy = a2a_fwd(vy.reshape(bc, plans.n1, n2k)).reshape(bc, nloc)
            ws.append(seg2(vx, vy, wf, cf, wi, ci))
        zs = []
        for w in ws:
            bc = w.shape[0]
            w = a2a_inv(w.reshape(bc, n1k, n2)).reshape(bc, nloc)
            zs.append(seg3(w, w3, c3))
        z = jnp.concatenate(zs) if nch > 1 else zs[0]
        return z.reshape(B, plans.n1, n2k)

    def local_fixed(xl, aspec, w1, c1, wf, cf, wi, ci, w3, c3):
        B = xl.shape[0]
        vx = fwd_to_spectral(xl, w1, c1)
        w = seg2f(vx, aspec.reshape(1, nloc), wf, cf, wi, ci)
        w = a2a_inv(w.reshape(B, n1k, n2)).reshape(B, nloc)
        z = seg3(w, w3, c3)
        return z.reshape(B, plans.n1, n2k)

    seg2x = _make_seg2_folded(plans, tb, interpret)
    seg3x = _make_seg3(plans, tb, interpret, plan=plans.p3x)

    def local_fixed_folded(xl, wx, cx, w1, c1, w3, c3):
        # the constant's diagonal lives inside (wx, cx): segment 2 is one
        # matmul, the pipeline is seg1 -> a2a -> seg2x -> a2a -> seg3x
        B = xl.shape[0]
        vx = fwd_to_spectral(xl, w1, c1)
        w = seg2x(vx, wx, cx)
        w = a2a_inv(w.reshape(B, n1k, n2)).reshape(B, nloc)
        z = seg3x(w, w3, c3)
        return z.reshape(B, plans.n1, n2k)

    coeff = P("data", None, "model")
    model0 = P("model")
    tabs = (jnp.asarray(plans.p1.W), jnp.asarray(plans.p1.const),
            jnp.asarray(plans.p2f.W), jnp.asarray(plans.p2f.const),
            jnp.asarray(plans.p2i.W), jnp.asarray(plans.p2i.const),
            jnp.asarray(plans.p3.W), jnp.asarray(plans.p3.const))
    tab_specs = (model0, model0, P(), P(), model0, model0, model0, model0)

    def polymul(x, y):
        B = x.shape[0]
        x3 = x.reshape(B, plans.n1, n2)
        y3 = y.reshape(B, plans.n1, n2)
        z3 = jax.shard_map(
            local_polymul, mesh=mesh,
            in_specs=(coeff, coeff) + tab_specs,
            out_specs=coeff, check_vma=False,
        )(x3, y3, *tabs)
        return z3.reshape(B, n)

    in_sh = NamedSharding(mesh, P("data", None))
    polymul_jit = jax.jit(polymul, in_shardings=(in_sh, in_sh),
                          out_shardings=in_sh)

    def prepare(a):
        """a (n,) -> SP-spectral layout (position-sharded flat (n,)): the
        fixed operand's forward transform, computed once (replicated over
        the data axis — a is one polynomial; stored LAZY, the pointwise
        accepts any uint32)."""
        a3 = jnp.asarray(a, jnp.uint32).reshape(1, plans.n1, n2)
        spec = jax.shard_map(
            lambda al, w1, c1, wf, cf: seg2fwd(
                fwd_to_spectral(al, w1, c1), wf, cf)[0],
            mesh=mesh,
            in_specs=(P(None, None, "model"), model0, model0, P(), P()),
            out_specs=P("model"), check_vma=False,
        )(a3, tabs[0], tabs[1], tabs[2], tabs[3])
        return spec.reshape(n)

    def fixed_mul(x, aspec):
        B = x.shape[0]
        x3 = x.reshape(B, plans.n1, n2)
        z3 = jax.shard_map(
            local_fixed, mesh=mesh,
            in_specs=(coeff, P("model")) + tab_specs,
            out_specs=coeff, check_vma=False,
        )(x3, aspec, *tabs)
        return z3.reshape(B, n)

    aspec_sh = NamedSharding(mesh, P("model"))
    fixed_jit = jax.jit(fixed_mul,
                        in_shardings=(in_sh, aspec_sh),
                        out_shardings=in_sh)
    prepare_jit = jax.jit(prepare, out_shardings=aspec_sh)

    # ---- folded fixed pair: prepare computes the spectrum on device,
    # then builds the per-constant folded tables host-side (exact object
    # ints, one-time per constant) under the shared worst-case plan.
    w3x = jnp.asarray(plans.p3x.W)
    c3x = jnp.asarray(plans.p3x.const)

    def fixed_folded_mul(x, wx, cx):
        B = x.shape[0]
        x3 = x.reshape(B, plans.n1, n2)
        z3 = jax.shard_map(
            local_fixed_folded, mesh=mesh,
            in_specs=(coeff, model0, model0, model0, model0, model0,
                      model0),
            out_specs=coeff, check_vma=False,
        )(x3, wx, cx, tabs[0], tabs[1], w3x, c3x)
        return z3.reshape(B, n)

    tab_sh = NamedSharding(mesh, P("model"))
    folded_jit = jax.jit(fixed_folded_mul,
                         in_shardings=(in_sh, tab_sh, tab_sh),
                         out_shardings=in_sh)

    def prepare_folded(a):
        spec = np.asarray(prepare_jit(a))      # lazy spectrum, host copy
        W, c = fourstep_fold_tables(plans, spec)
        return (jax.device_put(jnp.asarray(W), tab_sh),
                jax.device_put(jnp.asarray(c), tab_sh))

    return polymul_jit, (prepare_jit, fixed_jit), (prepare_folded,
                                                   folded_jit)


def polymul_fourstep_mxu_fn(name: str, mesh: Mesh, n1: int | None = None,
                            tile_b: int | None = None,
                            interpret: bool = False, chunks: int = 1):
    """Jitted sharded negacyclic polymul with MXU-kernel local compute:
    (B, n) x (B, n) -> (B, n), batch over 'data', four-step intra-transform
    over 'model' (2 all_to_alls per transform direction), bit-exact vs the
    jnp sharded path and the single-chip pipelines."""
    fn, _, _ = _build(name, mesh, n1, tile_b, interpret, chunks)
    return fn


def local_pipeline_fn(name: str, k: int, n1: int | None = None,
                      tile_b: int | None = None, device_index: int = 1):
    """Single-chip benchmark surface: the LOCAL compute one chip in a
    (model=k) group runs per sharded polymul — seg1 on both operands,
    seg2, seg3; the 3 all_to_alls are excluded (unmeasurable on one chip).
    Returns (jitted (B, nloc) x (B, nloc) -> (B, nloc), plans).

    Aggregate throughput of a k-chip group = B / t_local, so the per-chip
    SP tax = k * t_local / t_flagship.  Used by scripts/probe_sp.py and
    bench.py's stderr diagnostics to track the SP trend."""
    tbl = get_tables(name)
    if n1 is None:
        n1 = 1 << (tbl.logn // 2)
    plans = fourstep_mxu_plans(name, n1, k)
    tb = tile_b or _default_tile(plans.nloc)
    seg1 = _make_seg1(plans, tb, False)
    seg2 = _make_seg2(plans, tb, False)
    seg3 = _make_seg3(plans, tb, False)
    d = min(device_index, k - 1)       # a non-trivial device's tables
    t1 = (jnp.asarray(plans.p1.W[d:d + 1]),
          jnp.asarray(plans.p1.const[d:d + 1]))
    t2 = (jnp.asarray(plans.p2f.W), jnp.asarray(plans.p2f.const),
          jnp.asarray(plans.p2i.W[d:d + 1]),
          jnp.asarray(plans.p2i.const[d:d + 1]))
    t3 = (jnp.asarray(plans.p3.W[d:d + 1]),
          jnp.asarray(plans.p3.const[d:d + 1]))

    @jax.jit
    def pipe(x, y):
        vx = seg1(x, *t1)
        vy = seg1(y, *t1)
        w = seg2(vx, vy, *t2)
        return seg3(w, *t3)

    return pipe, plans


def polymul_fixed_fourstep_mxu_fn(name: str, mesh: Mesh,
                                  n1: int | None = None,
                                  tile_b: int | None = None,
                                  interpret: bool = False):
    """(prepare, multiply) for SP-sharded fixed-operand products: prepare(a)
    computes the position-sharded spectrum once; multiply(x, aspec) costs
    one forward + one inverse local pipeline and 2 all_to_alls."""
    _, pair, _ = _build(name, mesh, n1, tile_b, interpret)
    return pair


# ----------------------------------------------------------------------
# Round-5 lazy-boundary experiment (VERDICT r4 item 3): ship the seg1 ->
# seg2 all_to_all payload as the RAW int32 Horner class sums (biased to
# uint32), deleting seg1's recombination round at the price of Dout x the
# ICI bytes.  Design note on the "consumer skips its own split" half of
# the round-3 sketch: it is NOT achievable — the MXU consumes int8
# operands and the shipped class sums are ~22-bit, so the consumer must
# re-split EACH class plane into its own balanced digits (sum_j Din_j
# dots instead of Din).  What this path deletes is exactly one
# recombination (1 Shoup + Horner shifts/adds + bias add per coefficient);
# what it adds is (sum_j Din_j - Din) extra extraction+dot pipelines and
# (Dout - 1) x 4 bytes/coeff of a2a traffic.  Built to be measured
# (bench/probe_sp --classes), not argued.
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def class_boundary_plan(name: str, n1: int, k: int):
    """Consumer-side plan for the class-sum seg1->seg2 boundary: per-class
    digit splits of u_j = c_j + bounds_j in [0, 2*bounds_j] against the
    scaled row matrices K_j = (2^{8j} * K2f) mod q, all classes' dots
    accumulated into ONE recombination; seg1's centering const
    (off1 * colsum(K1)) is mapped through the a2a layout and folded
    through K2f into a per-(device, block) const row."""
    plans = fourstep_mxu_plans(name, n1, k)
    q, TW, A, n2 = plans.q, plans.TW, plans.A, plans.n2
    Bk, n2k, n1k = plans.Bk, plans.n2k, plans.n1k
    one_shoup = plans.ps.one_shoup
    p1 = plans.p1
    Dout = _ndigits(q)
    cls_b = [int(b) for b in p1.bounds]       # inclusive |c_j| maxima
    Ws, dins, bases, offs = [], [], [], []
    bounds_m = [0] * Dout
    for j, bj in enumerate(cls_b):
        in_b = 2 * bj + 1
        base = din = None
        for cand in (256, 128):
            d_ = _plane_count(in_b, cand)
            if d_ is not None and (din is None or d_ < din):
                base, din = cand, d_
        if din is None:
            raise ValueError(f"class bound {bj} uncoverable at any base")
        Kj = (plans.K2f * pow(2, 8 * j, q)) % q
        mw = np.zeros((din, Dout), dtype=np.int64)
        Wj, _ = _matrix_digit_block(Kj, q, din, Dout, mw, in_base=base)
        Ws.append(Wj)
        dins.append(din)
        bases.append(base)
        offs.append(bj)
        bj_bounds = _digit_bounds(
            mw, TW, _input_digit_maxima(din, bj, in_b, base))
        bounds_m = [a + b for a, b in zip(bounds_m, bj_bounds)]
    groups = _plan_groups(bounds_m, q, "any")
    raw_bound = _recombine_bound(groups, bounds_m, q)
    bias_sum = sum(
        _group_bound(bounds_m, j0, ln) * pow(2, 8 * j0, q)
        for j0, ln in groups)
    # seg1's pure centering const per producer lane, consumer-mapped:
    # true seg1 output = sum_j 2^{8j} c_j + off1*colsum(K1); the constant
    # term rides the boundary as a folded (const_vec @ K2f) row
    cs1 = np.zeros((k, A, TW), dtype=object)
    for d in range(k):
        for t in range(A):
            cs1[d, t] = (p1.off * plans.K1[d, t].sum(axis=0)) % q
    R = TW // n2
    const = np.zeros((k, A, 1, TW), dtype=np.uint32)
    for dc in range(k):
        for bb in range(A):
            vec = np.zeros(TW, dtype=object)
            for rho in range(R):
                j1 = dc * n1k + bb * R + rho        # source j1 of this row
                t_src, b_src = divmod(j1, Bk)
                for j2 in range(n2):
                    d_src, lam = divmod(j2, n2k)
                    vec[rho * n2 + j2] = cs1[d_src, t_src,
                                             b_src * n2k + lam]
            row = (vec @ plans.K2f) % q
            const[dc, bb, 0] = np.asarray(
                [(int(v) - bias_sum) % q for v in row], dtype=np.uint32)
    return types.SimpleNamespace(
        Dout=Dout, cls_b=cls_b, W=[jnp.asarray(w) for w in Ws],
        dins=tuple(dins), bases=tuple(bases), offs=tuple(offs),
        groups=tuple(groups), bounds=tuple(bounds_m), raw_bound=raw_bound,
        const=const, one_shoup=one_shoup)


def _make_seg1_classes(plans, cp, tile_b, interpret):
    """Column transform ending at RAW class sums: wide stages + digit
    split + dots, NO recombination; class m stored biased as
    uint32 c_m + cls_b[m] at columns [m*nloc + t*TW, ...)."""
    p = plans.p1
    TW, A, nloc = plans.TW, plans.A, plans.nloc
    Dout = cp.Dout

    def kernel(x_ref, w_ref, o_ref):
        blocks = [x_ref[:, t * TW:(t + 1) * TW] for t in range(A)]
        if plans.Lr:
            blocks = _fwd_rolls(blocks, plans.rolls)
        for t, blk in enumerate(blocks):
            planes = _digit_planes(blk, p.off, p.din, p.base)
            acc = None
            for i in range(p.din):
                d = lax.dot_general(planes[i], w_ref[0, t, i],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                acc = d if acc is None else acc + d
            for m in range(Dout):
                c = acc[:, m * TW:(m + 1) * TW]
                o_ref[:, m * nloc + t * TW:m * nloc + (t + 1) * TW] = (
                    c + np.int32(cp.cls_b[m])).astype(jnp.uint32)

    return _runner(kernel, plans.nloc, 1, 0, tile_b, interpret,
                   out_w=Dout * plans.nloc)


def _make_seg2_classes(plans, cp, tile_b, interpret):
    """Row segment consuming class-sum operands: per block, each class
    plane is split into its own balanced digits and dotted against the
    2^{8j}-scaled shared row tables; one combined recombination, then the
    usual pointwise + inverse row matmul."""
    TW, A, q, nloc = plans.TW, plans.A, plans.q, plans.nloc
    pi = plans.p2i
    ps = plans.ps
    Dout = cp.Dout

    def kernel(*refs):
        x_ref, y_ref = refs[0], refs[1]
        o_ref = refs[-1]
        wcs = refs[2:2 + Dout]
        cK_ref = refs[2 + Dout]
        wi_ref, ci_ref = refs[3 + Dout], refs[4 + Dout]

        def fwd_block(ref, bb):
            planes, ws = [], []
            for j in range(Dout):
                u = ref[:, j * nloc + bb * TW:j * nloc + (bb + 1) * TW]
                planes += _digit_planes(u, cp.offs[j], cp.dins[j],
                                        cp.bases[j])
                ws += [wcs[j][i] for i in range(cp.dins[j])]
            lazy, rb = _recombine_classes(planes, ws, cK_ref[0, bb], TW, q,
                                          cp.one_shoup, cp.groups,
                                          cp.bounds)
            assert rb == cp.raw_bound, "class-boundary bound drifted"
            return lazy

        for bb in range(A):
            X = fwd_block(x_ref, bb)
            Y = fwd_block(y_ref, bb)
            Z = pointwise_lazy(X, Y, q, ps, plans.pw_bound)
            lazy = _apply_lazy(Z, _w_slices(wi_ref, (0, bb), pi.din),
                               ci_ref[0, bb], pi)
            if pi.needs_reduce:
                lazy = reduce_bounded_2q(lazy, pi.raw_bound, q,
                                         ps.one_shoup)
            o_ref[:, bb * TW:(bb + 1) * TW] = lazy

    return _runner(kernel, plans.nloc, 2, 0, tile_b, interpret,
                   in_w=Dout * plans.nloc)


def polymul_fourstep_mxu_classes_fn(name: str, mesh: Mesh,
                                    n1: int | None = None,
                                    tile_b: int | None = None,
                                    interpret: bool = False):
    """Sharded four-step polymul with the CLASS-SUM seg1->seg2 boundary:
    the first all_to_all carries Dout uint32 planes per coefficient
    (biased raw class sums) instead of one recombined value.  Bit-exact
    vs polymul_fourstep_mxu_fn; exists to measure the lazy-boundary
    trade (VERDICT r4 item 3)."""
    tbl = get_tables(name)
    n = tbl.n
    if n1 is None:
        n1 = 1 << (tbl.logn // 2)
    k = mesh.shape["model"]
    plans = fourstep_mxu_plans(name, n1, k)
    cp = class_boundary_plan(name, n1, k)
    n2, n2k, n1k, nloc = plans.n2, plans.n2k, plans.n1k, plans.nloc
    Dout = cp.Dout
    tb = tile_b or _default_tile(nloc)
    seg1c = _make_seg1_classes(plans, cp, tb, interpret)
    seg2c = _make_seg2_classes(plans, cp, tb, interpret)
    seg3 = _make_seg3(plans, tb, interpret)

    def a2a_fwd_c(v4):     # (Bl, Dout, n1, n2k) -> (Bl, Dout, n1k, n2)
        return lax.all_to_all(v4, "model", split_axis=2, concat_axis=3,
                              tiled=True)

    def a2a_inv(v3):       # (Bl, n1k, n2) -> (Bl, n1, n2k)
        return lax.all_to_all(v3, "model", split_axis=2, concat_axis=1,
                              tiled=True)

    def local(xl, yl, w1, wc0, wc1, wc2, cK, wi, ci, w3, c3):
        wcs = (wc0, wc1, wc2)[:Dout]
        B = xl.shape[0]
        us = []
        for vl in (xl, yl):
            u = seg1c(vl.reshape(B, nloc), w1)
            u = a2a_fwd_c(u.reshape(B, Dout, plans.n1, n2k))
            us.append(u.reshape(B, Dout * nloc))
        w = seg2c(us[0], us[1], *wcs, cK, wi, ci)
        w = a2a_inv(w.reshape(B, n1k, n2)).reshape(B, nloc)
        z = seg3(w, w3, c3)
        return z.reshape(B, plans.n1, n2k)

    if Dout > 3:
        raise ValueError("class boundary supports Dout <= 3 table slots")
    wc_pad = list(cp.W) + [cp.W[-1]] * (3 - Dout)    # unused slots
    coeff = P("data", None, "model")
    model0 = P("model")
    tabs = (jnp.asarray(plans.p1.W), *wc_pad, jnp.asarray(cp.const),
            jnp.asarray(plans.p2i.W), jnp.asarray(plans.p2i.const),
            jnp.asarray(plans.p3.W), jnp.asarray(plans.p3.const))
    tab_specs = (model0, P(), P(), P(), model0, model0, model0, model0,
                 model0)

    def polymul(x, y):
        B = x.shape[0]
        x3 = x.reshape(B, plans.n1, n2)
        y3 = y.reshape(B, plans.n1, n2)
        z3 = jax.shard_map(
            local, mesh=mesh,
            in_specs=(coeff, coeff) + tab_specs,
            out_specs=coeff, check_vma=False,
        )(x3, y3, *tabs)
        return z3.reshape(B, n)

    in_sh = NamedSharding(mesh, P("data", None))
    return jax.jit(polymul, in_shardings=(in_sh, in_sh),
                   out_shardings=in_sh)


def local_pipeline_classes_fn(name: str, k: int, n1: int | None = None,
                              tile_b: int | None = None,
                              device_index: int = 1):
    """Single-chip benchmark surface of the class-boundary SP path (the
    a2as excluded, exactly as local_pipeline_fn): seg1-classes on both
    operands, seg2-classes, seg3.  Returns (jitted pipe, plans, cp)."""
    tbl = get_tables(name)
    if n1 is None:
        n1 = 1 << (tbl.logn // 2)
    plans = fourstep_mxu_plans(name, n1, k)
    cp = class_boundary_plan(name, n1, k)
    tb = tile_b or _default_tile(plans.nloc)
    seg1c = _make_seg1_classes(plans, cp, tb, False)
    seg2c = _make_seg2_classes(plans, cp, tb, False)
    seg3 = _make_seg3(plans, tb, False)
    d = min(device_index, k - 1)
    w1 = jnp.asarray(plans.p1.W[d:d + 1])
    cK = jnp.asarray(cp.const[d:d + 1])
    wi = jnp.asarray(plans.p2i.W[d:d + 1])
    ci = jnp.asarray(plans.p2i.const[d:d + 1])
    w3 = jnp.asarray(plans.p3.W[d:d + 1])
    c3 = jnp.asarray(plans.p3.const[d:d + 1])

    @jax.jit
    def pipe(x, y):
        ux = seg1c(x, w1)
        uy = seg1c(y, w1)
        w = seg2c(ux, uy, *cp.W, cK, wi, ci)
        return seg3(w, w3, c3)

    return pipe, plans, cp


def polymul_fixed_folded_fourstep_mxu_fn(name: str, mesh: Mesh,
                                         n1: int | None = None,
                                         tile_b: int | None = None,
                                         interpret: bool = False):
    """(prepare, multiply) for the FOLDED SP fixed-operand path (round-4):
    prepare(a) computes the constant's spectrum on device, then folds its
    pointwise diagonal into per-(device, block) segment-2 matrices
    host-side (one-time per constant, shared worst-case plan p2x);
    multiply(x, (W, c)) runs seg1 -> a2a -> ONE folded matmul -> a2a ->
    seg3 — one digit-split/recombination round fewer than the unfolded
    fixed path (VERDICT round-3 item 2's "delete one of the four rounds",
    realizable exactly when the second operand is constant, the serving
    shape; reference anchor NTT.cu:1155-1160).  Bit-exact vs the unfolded
    fixed path and the single-chip pipelines."""
    _, _, pair = _build(name, mesh, n1, tile_b, interpret)
    return pair
