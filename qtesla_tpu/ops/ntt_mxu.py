"""MXU-accelerated fused negacyclic polymul: butterfly stages as int8
systolic-array matmuls.

The roll-based fused kernel (ntt_pallas.py) is VPU-bound: ~60% of its time is
butterfly data movement (lane rolls + selects) and the rest 32-bit Shoup
multiplies, both on the vector unit.  This variant moves almost all of that
onto the MXU, the unit with ~100x the int multiply-accumulate throughput:

- The first `Lr = log2(n) - 7` forward stages (pair distance >= 128) stay as
  cheap vreg-aligned lane rolls (distances are multiples of the 128-lane
  vreg width).
- The remaining 7 stages act independently inside each aligned 128-lane
  block (pair distance < 128 never crosses a block), so their composition is
  a block-diagonal linear map: one exact 128x128 matrix per block, derived
  offline by running the stage recurrences of the merged-psi CT forward /
  GS inverse (same tables as ntt_pallas, so results are bit-identical) over
  the identity basis in int64 mod q.
- Each matmul runs on the MXU in int8 with balanced base-256 digits:
  operands x are centered (|x - q//2| <= q/2) and split into D signed
  digits; the CONSTANT matrices absorb the basis weights 2^{8i} *before*
  their own digit split (W^(i) = 2^{8i} W mod q), so one (TB,128) x
  (128, Dw*128) int8 matmul per (block, digit) yields partial sums c_j with
  out = sum_j 2^{8j} c_j + const (mod q) — recombination is only Dw-1 Shoup
  multiplies per coefficient instead of a 10-stage butterfly chain.
- The inverse mirrors it: per-block inverse matmul (stages with distance
  < 128, i.e. the first 7 GS-inverse stages) followed by Lr inverse roll
  stages, whose last stage carries n^{-1} and canonicalizes.

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

from .modmul import mulmod_barrett, shoup_mulmod_lazy
from .ntt_pallas import _csub, _iota_cols, _partners
from .tables import NttTables, get_tables

__all__ = ["polymul_mxu_fn", "ntt_mxu_fn", "intt_mxu_fn", "get_mxu_tables"]

_BIAS = 1 << 24          # additive bias making int32 partial sums positive
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


def _plan_groups(bounds: list[int]) -> list[tuple[int, int]]:
    """Greedily pack digit classes j (weight 2^{8j}, worst-case |c_j| <=
    bounds[j]) into groups whose int32 Horner combination
    g = c_{j0} + 256*c_{j0+1} + ... provably fits in int32.  Returns
    [(j0, len), ...]; group 0 starting at class 0 needs NO modmul at all,
    every other group costs one Shoup multiply by 2^{8*j0} mod q."""
    groups = []
    j = 0
    while j < len(bounds):
        ln, bound = 1, bounds[j]
        while (j + ln < len(bounds)
               and bound + (256 ** ln) * bounds[j + ln] < (1 << 31)):
            bound += (256 ** ln) * bounds[j + ln]
            ln += 1
        groups.append((j, ln))
        j += ln
    return groups


def _group_bound(bounds, j0, ln) -> int:
    return sum((256 ** m) * bounds[j0 + m] for m in range(ln))


def _block_digit_tables(M: np.ndarray, q: int, bw: int, D: int):
    """Turn a block-diagonal (n, n) stage matrix into MXU operand tables.

    Returns (W, const, bounds): W int8 of shape (nb, D, bw, D*bw) with
    W[b, i, :, j*bw:(j+1)*bw] = digit_j(center(2^{8i} * M_b^T mod q)); const
    uint32 (nb, 1, bw) folding the operand-centering offset q//2 and the
    recombination biases; bounds[j] = exact worst-case |c_j| over all blocks
    (used to plan the int32 class packing).  In-kernel:

        out_k = sum_j 2^{8j} c_jk + const_k   (mod q),
        c_j   = sum_i digits_i(x - q//2) @ W[b, i][:, j*bw:(j+1)*bw].
    """
    n = M.shape[0]
    nb = n // bw
    off = q >> 1
    W = np.zeros((nb, D, bw, D * bw), dtype=np.int8)
    colsums = np.zeros((nb, bw), dtype=object)
    mw = np.zeros((D, D), dtype=np.int64)     # max |digit_j(2^{8i} K)|
    for b in range(nb):
        Mb = M[b * bw:(b + 1) * bw, b * bw:(b + 1) * bw]
        # block-diagonality sanity: nothing outside the diagonal block
        row = M[b * bw:(b + 1) * bw].copy()
        row[:, b * bw:(b + 1) * bw] = 0
        assert not row.any(), "stage range is not block-local"
        K = Mb.T % q                       # out = x_vec @ K
        for i in range(D):
            Ki = (K * pow(2, 8 * i, q)) % q
            Kc = np.where(Ki > q // 2, Ki - q, Ki)   # centered, |.| <= q/2
            for jd, dig in enumerate(_balanced_digits(Kc, D)):
                W[b, i, :, jd * bw:(jd + 1) * bw] = dig.astype(np.int8)
                mw[i, jd] = max(mw[i, jd], np.abs(dig).max())
        colsums[b] = K.sum(axis=0, dtype=object)
    # worst-case |c_j| = sum_i (bw lanes) * (|x digit| <= 128) * max|W digit|
    bounds = [int(sum(bw * 128 * mw[i, j] for i in range(D)))
              for j in range(D)]
    groups = _plan_groups(bounds)
    # const absorbs the centering offset and the per-group +2^31 bias
    # (u_g = g + 2^31 exactly, via two's-complement uint32 view)
    bias_sum = sum((1 << 31) * pow(2, 8 * j0, q) for j0, _ in groups)
    const = np.zeros((nb, 1, bw), dtype=np.uint32)
    for b in range(nb):
        const[b, 0, :] = np.asarray(
            [(off * int(cs) - bias_sum) % q for cs in colsums[b]],
            dtype=np.uint32)
    return W, const, bounds, groups


class MxuTables:
    """Matmul-form stage tables for one parameter set."""

    def __init__(self, tbl: NttTables):
        self.tbl = tbl
        n, q, L = tbl.n, tbl.q, tbl.logn
        self.n, self.q, self.logn = n, q, L
        self.bw = bw = min(_BW_MAX, n)
        self.nb = n // bw
        self.Lr = L - bw.bit_length() + 1      # roll stages (distance >= bw)
        self.D = _ndigits(q)
        # scalars for recombination: 2^{8j} mod q + Shoup companions
        self.pow2 = [pow(2, 8 * j, q) for j in range(self.D)]
        self.pow2_shoup = [(w << 32) // q for w in self.pow2]
        (self.wf, self.constf, self.bounds_f,
         self.groups_f) = _block_digit_tables(
            _fwd_matrix(tbl, self.Lr), q, bw, self.D)
        (self.wi, self.consti, self.bounds_i,
         self.groups_i) = _block_digit_tables(
            _inv_matrix(tbl, L - self.Lr), q, bw, self.D)
        # roll-stage twiddle tables (signed fwd rows / inverse tail rows)
        self.rtw_f = tbl.ct_fwd_full_signed[:self.Lr]
        self.rtw_f_shoup = tbl.ct_fwd_full_signed_shoup[:self.Lr]
        self.rtw_i = tbl.gs_inv_full[L - self.Lr:]
        self.rtw_i_shoup = tbl.gs_inv_full_shoup[L - self.Lr:]


@functools.lru_cache(maxsize=None)
def get_mxu_tables(name: str) -> MxuTables:
    return MxuTables(get_tables(name))


# ----------------------------------------------------------------------
# Kernel building blocks (trace-time python over static D / nb / Lr).
# ----------------------------------------------------------------------

def _digit_planes(v_canon, off: int, D: int):
    """Canonical uint32 [0, q) -> D balanced-digit int8 planes of x - q//2."""
    a = v_canon.astype(jnp.int32) - np.int32(off)
    planes = []
    for _ in range(D - 1):
        d = ((a + np.int32(128)) & np.int32(255)) - np.int32(128)
        planes.append(d.astype(jnp.int8))
        a = (a - d) >> np.int32(8)
    planes.append(a.astype(jnp.int8))
    return planes


def _block_matmul(planes, w_ref, const_ref, mt: MxuTables, groups, bounds):
    """Apply the block-diagonal stage matrix: int8 MXU matmuls + packed
    Shoup recombination.  Input: D digit planes (TB, n) int8 of centered
    values; output (TB, n) uint32, lazy, congruent mod q.

    Digit classes are Horner-packed per the precomputed `groups` plan:
    g = c_{j0} + 256 c_{j0+1} + ... (provably int32-exact), viewed as
    uint32 with a +2^31 bias (exact by two's complement), so the group
    starting at class 0 costs NO multiply and every other group exactly one
    Shoup multiply by 2^{8 j0} mod q.  Worst-case magnitudes are tracked as
    python ints; conditional subtracts are inserted only where the uint32
    sum could otherwise overflow."""
    bw, nb, D, q = mt.bw, mt.nb, mt.D, mt.q
    outs = []
    for b in range(nb):
        acc = None
        for i in range(D):
            p = lax.dot_general(planes[i][:, b * bw:(b + 1) * bw],
                                w_ref[b, i],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
            acc = p if acc is None else acc + p
        # terms: (value uint32, exact worst-case bound as python int)
        terms = [(const_ref[b], q - 1)]
        for j0, ln in groups:
            g = acc[:, (j0 + ln - 1) * bw:(j0 + ln) * bw]
            for m in range(ln - 2, -1, -1):
                g = acc[:, (j0 + m) * bw:(j0 + m + 1) * bw] + (g << 8)
            u = g.astype(jnp.uint32) + np.uint32(1 << 31)   # = g + 2^31
            if j0 == 0:
                terms.append((u, (1 << 31) + _group_bound(bounds, j0, ln)))
            else:
                w = pow(2, 8 * j0, q)
                s = shoup_mulmod_lazy(u, np.uint32(w),
                                      np.uint32((w << 32) // q), q)
                terms.append((s, 2 * q - 1))
        # sum with overflow-aware laziness
        total = sum(bd for _, bd in terms)
        if total >= 1 << 32:
            red = []
            for v, bd in terms:
                if bd >= 2 * q:
                    v = shoup_mulmod_lazy(v, jnp.uint32(1),
                                          jnp.uint32(mt.tbl.ps.one_shoup), q)
                    bd = 2 * q - 1
                red.append((_csub(v, q), q - 1))
            terms = red
            assert sum(bd for _, bd in terms) < 1 << 32, "recombine overflow"
        z = functools.reduce(lambda a, v: a + v[0], terms[1:], terms[0][0])
        outs.append(z)
    return outs[0] if nb == 1 else jnp.concatenate(outs, axis=1)


def _fwd_rolls(v, col, rtw_ref, rtw_sh_ref, mt: MxuTables):
    """Lr merged-psi CT roll stages (distances n/2 .. 128), Harvey-lazy;
    in [0, q) -> out [0, 4q) -> csub'd back to canonical for digit split."""
    n, q = mt.n, mt.q
    for s in range(mt.Lr):
        t = n >> (s + 1)
        bit = (col & t) != 0
        uu, vv = _partners(v, bit, t)
        hi = shoup_mulmod_lazy(vv, rtw_ref[s], rtw_sh_ref[s], q)
        v = _csub(uu, 2 * q) + hi
    return _csub(_csub(v, 2 * q), q)


def _inv_rolls(v, col, rtw_ref, rtw_sh_ref, mt: MxuTables):
    """Lr merged-psi GS inverse roll stages (distances 128 .. n/2); accepts
    [0, 2q); the last stage carries n^{-1} and canonicalizes."""
    n, q, L = mt.n, mt.q, mt.logn
    for k in range(mt.Lr):
        s = L - mt.Lr + k
        t = 1 << s
        bit = (col & t) != 0
        uu, vv = _partners(v, bit, t)
        d = uu - vv + np.uint32(2 * q)
        if s < L - 1:
            su = _csub(uu + vv, 2 * q)
            hi = shoup_mulmod_lazy(d, rtw_ref[k], rtw_sh_ref[k], q)
            v = jnp.where(bit, hi, su)
        else:
            v = shoup_mulmod_lazy(jnp.where(bit, d, uu + vv),
                                  rtw_ref[k], rtw_sh_ref[k], q)
            v = _csub(v, q)
    return v


def _fwd_mxu(v, col, refs, mt: MxuTables):
    """Full forward NTT: roll stages -> digit split -> MXU block matmul.
    Output lazy uint32 (< 2^25 + D*q), order identical to ntt_fwd_merged."""
    if mt.Lr:
        v = _fwd_rolls(v, col, refs["rtwf"], refs["rtwf_sh"], mt)
    planes = _digit_planes(v, mt.q >> 1, mt.D)
    return _block_matmul(planes, refs["wf"], refs["constf"], mt,
                         mt.groups_f, mt.bounds_f)


def _inv_mxu(v_canon, col, refs, mt: MxuTables):
    """Full inverse NTT from canonical input; canonical output."""
    planes = _digit_planes(v_canon, mt.q >> 1, mt.D)
    v = _block_matmul(planes, refs["wi"], refs["consti"], mt,
                      mt.groups_i, mt.bounds_i)
    if mt.Lr:
        # reduce lazy sum into [0, 2q) for the roll stages
        v = shoup_mulmod_lazy(v, jnp.uint32(1),
                              jnp.uint32(mt.tbl.ps.one_shoup), mt.q)
        v = _inv_rolls(v, col, refs["rtwi"], refs["rtwi_sh"], mt)
    else:
        v = shoup_mulmod_lazy(v, jnp.uint32(1),
                              jnp.uint32(mt.tbl.ps.one_shoup), mt.q)
        v = _csub(v, mt.q)
    return v


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
        if mt.Lr:
            add("rtwf", mt.rtw_f)
            add("rtwf_sh", mt.rtw_f_shoup)
        add("wf", mt.wf)
        add("constf", mt.constf)
    if want_inv:
        add("wi", mt.wi)
        add("consti", mt.consti)
        if mt.Lr:
            add("rtwi", mt.rtw_i)
            add("rtwi_sh", mt.rtw_i_shoup)
    specs = [pl.BlockSpec(a.shape, (lambda *_, nd=a.ndim: (0,) * nd),
                          memory_space=pltpu.VMEM) for a in arrs]
    return names, arrs, specs


def _make_runner(kernel, mt: MxuTables, num_tensor_in: int, names, arrs,
                 tab_specs, tile_b: int, interpret: bool):
    n = mt.n

    def run(*tensors):
        B = tensors[0].shape[0]
        pad = (-B) % tile_b
        if pad:
            tensors = tuple(jnp.pad(v, ((0, pad), (0, 0))) for v in tensors)
        Bp = B + pad
        tens_specs = [pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
                      for _ in range(num_tensor_in)]
        kwargs = {}
        if not interpret:
            # the resident digit tables are double-buffered by the pipeline;
            # raise the scoped-vmem cap beyond the conservative 16MB default
            # for the large-n / 4-digit parameter sets
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        out = pl.pallas_call(
            kernel,
            grid=(Bp // tile_b,),
            in_specs=tens_specs + tab_specs,
            out_specs=pl.BlockSpec((tile_b, n), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, n), jnp.uint32),
            interpret=interpret,
            **kwargs,
        )(*tensors, *arrs)
        return out[:B] if pad else out

    return run


def _tile_b(mt: MxuTables, requested: int | None) -> int:
    if requested:
        return requested
    # Fit tile-dependent buffers (x/y/z + lazy temps + digit planes,
    # ~32 bytes/coeff empirically) plus the resident digit tables in the
    # ~16 MB VMEM budget.  tile_b=256 measured fastest for n=1024 on v5e
    # (sweep 64..512, 2026-08).
    tables = 2 * mt.nb * mt.D * mt.bw * (mt.D * mt.bw)
    cap = (14 * 1024 * 1024 - tables) // (32 * mt.n)
    tb = 8
    while tb * 2 <= min(cap, 256):
        tb *= 2
    return tb


@functools.lru_cache(maxsize=None)
def polymul_mxu_fn(name: str, tile_b: int | None = None,
                   interpret: bool = False):
    """Jitted MXU-matmul negacyclic polymul: (B, n) x (B, n) -> (B, n),
    bit-identical to algo='merged'/'fused'."""
    mt = get_mxu_tables(name)
    ps = mt.tbl.ps
    names, arrs, specs = _table_inputs(mt, True, True)

    def kernel(*refs):
        x_ref, y_ref = refs[0], refs[1]
        z_ref = refs[-1]
        tab = dict(zip(names, refs[2:-1]))
        col = _iota_cols(x_ref.shape)
        X = _fwd_mxu(x_ref[:], col, tab, mt)
        Y = _fwd_mxu(y_ref[:], col, tab, mt)
        Z = mulmod_barrett(X, Y, mt.q, ps.r32, ps.r32_shoup, ps.one_shoup)
        z_ref[:] = _inv_mxu(Z, col, tab, mt)

    run = _make_runner(kernel, mt, 2, names, arrs, specs,
                       _tile_b(mt, tile_b), interpret)

    def fn(x, y):
        return run(jnp.asarray(x, jnp.uint32), jnp.asarray(y, jnp.uint32))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def ntt_mxu_fn(name: str, tile_b: int | None = None,
               interpret: bool = False):
    """Jitted forward NTT (canonical out), bit-identical to ntt_fwd_merged."""
    mt = get_mxu_tables(name)
    names, arrs, specs = _table_inputs(mt, True, False)

    def kernel(*refs):
        x_ref, out_ref = refs[0], refs[-1]
        tab = dict(zip(names, refs[1:-1]))
        col = _iota_cols(x_ref.shape)
        X = _fwd_mxu(x_ref[:], col, tab, mt)
        X = shoup_mulmod_lazy(X, jnp.uint32(1),
                              jnp.uint32(mt.tbl.ps.one_shoup), mt.q)
        out_ref[:] = _csub(X, mt.q)

    run = _make_runner(kernel, mt, 1, names, arrs, specs,
                       _tile_b(mt, tile_b), interpret)
    return jax.jit(lambda x: run(jnp.asarray(x, jnp.uint32)))


@functools.lru_cache(maxsize=None)
def intt_mxu_fn(name: str, tile_b: int | None = None,
                interpret: bool = False):
    """Jitted inverse NTT, bit-identical to intt_inv_merged."""
    mt = get_mxu_tables(name)
    names, arrs, specs = _table_inputs(mt, False, True)

    def kernel(*refs):
        x_ref, out_ref = refs[0], refs[-1]
        tab = dict(zip(names, refs[1:-1]))
        col = _iota_cols(x_ref.shape)
        out_ref[:] = _inv_mxu(x_ref[:], col, tab, mt)

    run = _make_runner(kernel, mt, 1, names, arrs, specs,
                       _tile_b(mt, tile_b), interpret)
    return jax.jit(lambda x: run(jnp.asarray(x, jnp.uint32)))
