"""MXU-matmul kernel tests (interpret mode on CPU — same kernel code the
TPU compiles).  The int8 systolic-array path must be bit-identical to the
merged-psi reference pipeline for every parameter set: the limb
decomposition, balanced digits, packed recombination and block stage
matrices are all exact-integer constructions (ntt_mxu.py)."""

import numpy as np
import pytest

from qtesla_tpu.models import polymul_negacyclic
from qtesla_tpu.ops import ntt as N
from qtesla_tpu.ops.ntt_mxu import (get_mxu_tables, intt_mxu_fn, ntt_mxu_fn,
                                    polymul_mxu_fn)
from qtesla_tpu.ops.tables import get_tables
from qtesla_tpu.params import get_params

# Tiering (round 5): the default tier runs every mxu test at smallprime;
# the real qTESLA sets are the slow tier (the flagship q-iii interpret
# checks run there and in the real-TPU lane; default-tier q-iii interpret
# coverage is the sharded classes-boundary test in test_sharded.py); the
# p-sets (n=1024/2048, D=4 digit tables) dominate interpret runtime and
# are the exhaustive tier.
SETS = ["smallprime",
        pytest.param("qtesla-i", marks=pytest.mark.slow),
        pytest.param("qtesla-iii-speed", marks=pytest.mark.slow),
        pytest.param("qtesla-p-i", marks=pytest.mark.exhaustive),
        pytest.param("qtesla-p-iii", marks=pytest.mark.exhaustive)]
SETS_LIGHT = ["smallprime",
              pytest.param("qtesla-i", marks=pytest.mark.slow),
              pytest.param("qtesla-iii-speed", marks=pytest.mark.slow),
              pytest.param("qtesla-p-i", marks=pytest.mark.exhaustive),
              pytest.param("qtesla-p-iii",
                           marks=pytest.mark.exhaustive)]


@pytest.mark.parametrize("name", SETS)
def test_mxu_polymul_bit_exact(rng, name):
    ps = get_params(name)
    x = rng.integers(0, ps.q, (5, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (5, ps.n), dtype=np.uint32)
    z = np.asarray(polymul_mxu_fn(name, interpret=True)(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", SETS_LIGHT)
def test_mxu_transforms_match_merged(rng, name):
    import jax
    import jax.numpy as jnp
    ps = get_params(name)
    tbl = get_tables(name)
    x = rng.integers(0, ps.q, (4, ps.n), dtype=np.uint32)
    X = np.asarray(ntt_mxu_fn(name, interpret=True)(x))
    want = np.asarray(jax.jit(
        lambda v: N.ntt_fwd_merged(v, tbl))(jnp.asarray(x)))
    np.testing.assert_array_equal(X, want)
    back = np.asarray(intt_mxu_fn(name, interpret=True)(X))
    np.testing.assert_array_equal(back, x)


@pytest.mark.parametrize("name", SETS)
def test_mxu_table_invariants(name):
    """Digit tables reconstruct the exact stage matrices and the packing
    plan respects its int32 bound."""
    mt = get_mxu_tables(name)
    q, bw, D = mt.q, mt.bw, mt.D
    # every class group the kernel Horner-packs must fit in int32
    for groups, bounds in ((mt.groups_f, mt.bounds_f),
                           (mt.groups_i, mt.bounds_i)):
        for j0, ln in groups:
            assert sum((256 ** m) * bounds[j0 + m]
                       for m in range(ln)) < 1 << 31
    # digits of W recombine to 2^{8i} * K mod q (spot-check block 0, i=0)
    W = mt.wf[0].astype(np.int64)          # (D, bw, D*bw)
    rec = np.zeros((bw, bw), dtype=np.int64)
    for jd in range(D):
        rec += (1 << (8 * jd)) * W[0, :, jd * bw:(jd + 1) * bw]
    from qtesla_tpu.ops.ntt_mxu import _fwd_matrix
    M = _fwd_matrix(mt.tbl, mt.Lr)
    K = M[:bw, :bw].T % q
    np.testing.assert_array_equal(rec % q, K % q)


def test_mxu_batch_padding(rng):
    ps = get_params("smallprime")
    for B in [7]:          # pads 1 row; B=1/3 exercise the same path
        x = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
        y = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
        z = np.asarray(polymul_mxu_fn("smallprime", interpret=True)(x, y))
        want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
        np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", SETS_LIGHT)
def test_mxu_polymul_adversarial_operands(name):
    """Laziness-bound stress: operands pinned at the extremes (q-1 and 0
    patterns) maximize every intermediate magnitude in the lazy chains
    (sloppy Shoup products, packed recombination, pointwise folds)."""
    ps = get_params(name)
    n = ps.n
    x = np.full((4, n), ps.q - 1, dtype=np.uint32)
    y = np.full((4, n), ps.q - 1, dtype=np.uint32)
    x[1, ::2] = 0
    y[2, 1::2] = 0
    x[3] = np.arange(n, dtype=np.uint32) % ps.q
    z = np.asarray(polymul_mxu_fn(name, interpret=True)(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", SETS_LIGHT)
def test_mxu_polymul_fixed_operand(rng, name):
    """Fixed-operand product (precomputed spectrum for the constant side)
    matches the streamed two-operand pipeline bit-exactly."""
    from qtesla_tpu.ops.ntt_mxu import ntt_mxu_fn, polymul_fixed_mxu_fn
    ps = get_params(name)
    a = rng.integers(0, ps.q, (1, ps.n), dtype=np.uint32)
    x = rng.integers(0, ps.q, (5, ps.n), dtype=np.uint32)
    A = np.asarray(ntt_mxu_fn(name, interpret=True)(a))
    z = np.asarray(polymul_fixed_mxu_fn(name, interpret=True)(x, A[0]))
    want = np.asarray(polymul_negacyclic(
        x, np.broadcast_to(a, x.shape), ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


def test_polymul_fixed_fn_merged(rng):
    """The jnp fixed-operand pair (CPU-testable) matches the pipelines."""
    from qtesla_tpu.models import polymul_fixed_fn
    ps = get_params("qtesla-iii-speed")
    prep, mul = polymul_fixed_fn(ps.name, "merged")
    a = rng.integers(0, ps.q, (ps.n,), dtype=np.uint32)
    x = rng.integers(0, ps.q, (5, ps.n), dtype=np.uint32)
    z = np.asarray(mul(x, prep(a)))
    want = np.asarray(polymul_negacyclic(
        x, np.broadcast_to(a, x.shape), ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


def test_mxu_leading_axes(rng):
    """Pallas kernels accept arbitrary leading batch axes (and rank-1),
    matching the jnp pipelines' batching contract."""
    ps = get_params("smallprime")
    x = rng.integers(0, ps.q, (2, 3, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (2, 3, ps.n), dtype=np.uint32)
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    z = np.asarray(polymul_mxu_fn("smallprime", interpret=True)(x, y))
    np.testing.assert_array_equal(z, want)
    z1 = np.asarray(polymul_mxu_fn("smallprime", interpret=True)(
        x[0, 0], y[0, 0]))
    np.testing.assert_array_equal(z1, want[0, 0])


@pytest.mark.parametrize("name", ["smallprime",
                                  pytest.param("qtesla-i",
                                               marks=pytest.mark.exhaustive),
                                  pytest.param("qtesla-iii-speed",
                                               marks=pytest.mark.slow)])
def test_mxu_fixed_accepts_merged_spectrum(rng, name):
    """Mixed-algo interchangeability: a spectrum prepared with the jnp
    merged forward NTT feeds the MXU fixed-operand kernel (the docstrings
    advertise identical spectral order)."""
    import jax
    import jax.numpy as jnp
    from qtesla_tpu.ops.ntt_mxu import polymul_fixed_mxu_fn
    tbl = get_tables(name)
    ps = get_params(name)
    a = rng.integers(0, ps.q, (1, ps.n), dtype=np.uint32)
    x = rng.integers(0, ps.q, (3, ps.n), dtype=np.uint32)
    A = np.asarray(jax.jit(
        lambda v: N.ntt_fwd_merged(v, tbl))(jnp.asarray(a)))
    z = np.asarray(polymul_fixed_mxu_fn(name, interpret=True)(x, A[0]))
    want = np.asarray(polymul_negacyclic(
        x, np.broadcast_to(a, x.shape), ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


def test_mxu_dp_shard_map_interpret(rng):
    """The shard_map DP wrapping used by polymul_dp_fn for Pallas algos,
    validated on the virtual CPU mesh with the interpret-mode kernel:
    every shard computes exactly its local batch."""
    import jax
    from qtesla_tpu.parallel import make_mesh
    from jax.sharding import PartitionSpec as P
    ps = get_params("smallprime")
    mesh = make_mesh(data=4, model=2)
    kernel = polymul_mxu_fn("smallprime", interpret=True)
    fn = jax.jit(jax.shard_map(
        kernel, mesh=mesh,
        in_specs=(P(("data", "model")), P(("data", "model"))),
        out_specs=P(("data", "model")), check_vma=False))
    x = rng.integers(0, ps.q, (16, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (16, ps.n), dtype=np.uint32)
    z = np.asarray(fn(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", ["smallprime",
                                  pytest.param("qtesla-i",
                                               marks=pytest.mark.slow),
                                  pytest.param("qtesla-iii-speed",
                                               marks=pytest.mark.slow),
                                  pytest.param("qtesla-p-i",
                                               marks=pytest.mark.exhaustive),
                                  pytest.param("qtesla-p-iii",
                                               marks=pytest.mark.exhaustive)])
def test_mxu_fixed_folded_bit_exact(rng, name):
    """Constant-folded fixed-operand kernel: the constant's pointwise
    diagonal is folded into per-constant inverse matmul tables
    (fixed_fold_plan / fixed_fold_tables — the reference's pointwise_mult,
    NTT.cu:1155-1160, becomes a column scaling of constant matrices), so
    the kernel runs forward -> inverse with no pointwise stage.  Must be
    bit-identical to the merged pipeline for every parameter set."""
    from qtesla_tpu.ops.ntt_mxu import (fixed_fold_tables, ntt_mxu_fn,
                                        polymul_fixed_folded_mxu_fn)
    ps = get_params(name)
    a = rng.integers(0, ps.q, (ps.n,), dtype=np.uint32)
    x = rng.integers(0, ps.q, (5, ps.n), dtype=np.uint32)
    spec = np.asarray(ntt_mxu_fn(name, interpret=True)(a.reshape(1, -1)))[0]
    W, c = fixed_fold_tables(name, spec)
    z = np.asarray(
        polymul_fixed_folded_mxu_fn(name, interpret=True)(x, W, c))
    want = np.asarray(polymul_negacyclic(
        x, np.broadcast_to(a, x.shape), ps, algo="merged"))
    np.testing.assert_array_equal(z, want)
    # edge diagonals through the SAME shared worst-case plan: all-zero
    # (annihilates everything) and all-(q-1) (maximal centered magnitudes)
    for const in (0, ps.q - 1):
        d = np.full((ps.n,), const, dtype=np.uint32)
        W, c = fixed_fold_tables(name, d)
        z = np.asarray(
            polymul_fixed_folded_mxu_fn(name, interpret=True)(x[:2], W, c))
        # reference product: intt(ntt(x) * d) via the merged pipeline
        import jax
        import jax.numpy as jnp
        tbl = get_tables(name)
        want = np.asarray(jax.jit(lambda v: N.intt_inv_merged(
            N.pointwise_mul(N.ntt_fwd_merged(v, tbl),
                            jnp.full((ps.n,), const, jnp.uint32), tbl),
            tbl))(jnp.asarray(x[:2])))
        np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", SETS)
def test_fixed_fold_table_invariants(rng, name):
    """The folded tables reconstruct M_inv @ diag(A^) mod q exactly under
    the shared worst-case plan, and the plan's Horner groups fit int32."""
    from qtesla_tpu.ops.ntt_mxu import (_inv_matrix, fixed_fold_plan,
                                        fixed_fold_tables)
    from qtesla_tpu.ops.ntt_mxu import get_mxu_tables
    ps = get_params(name)
    mt = get_mxu_tables(name)
    fp = fixed_fold_plan(name)
    for j0, ln in fp.groups:
        assert sum((256 ** m) * fp.bounds[j0 + m]
                   for m in range(ln)) < 1 << 31
    spec = rng.integers(0, ps.q, (ps.n,), dtype=np.uint32)
    W, c = fixed_fold_tables(name, spec)
    W = np.asarray(W)
    q, bw = ps.q, mt.bw
    Mi = _inv_matrix(mt.tbl, mt.logn - mt.Lr).astype(object)
    Mp = (Mi * spec.astype(object)[None, :]) % q
    for b in (0, mt.nb - 1):
        K = Mp[b * bw:(b + 1) * bw, b * bw:(b + 1) * bw].T
        for i in range(fp.Din):
            rec = np.zeros((bw, bw), dtype=object)
            for j in range(fp.Dout):
                rec = rec + (W[b, i][:, j * bw:(j + 1) * bw]
                             .astype(object) * (256 ** j))
            assert (((rec - K * pow(fp.base, i, q)) % q) == 0).all(), \
                (name, b, i)
