"""Pairing-kernel tests (interpret mode on CPU — same kernel code the TPU
compiles).  Each of the reference's five explicit pipeline pairings
(NTT.cu:2008-2443) has a fused Pallas device kernel in
ops/ntt_pairings_pallas.py; here every kernel is checked bit-exact against
BOTH its jnp/XLA pipeline twin (same pairing, models/polymul.py) and the
flagship merged pipeline — so a kernel bug and a matching XLA-pipeline bug
cannot cancel."""

import numpy as np
import pytest

from qtesla_tpu.models import polymul_negacyclic
from qtesla_tpu.models.polymul import polymul_fn
from qtesla_tpu.ops.ntt_pairings_pallas import PAIRINGS, polymul_pairing_fn
from qtesla_tpu.params import get_params

# interpret mode pays per-op emulation cost: the cheap set covers every
# pairing in the default tier; the real qTESLA sets run in the slow tier
# (ct_gs exercises both bitrev placements, stockham the rotation network)
SETS = ["smallprime",
        pytest.param("qtesla-iii-speed", marks=pytest.mark.slow),
        pytest.param("qtesla-i", marks=pytest.mark.slow)]


@pytest.mark.parametrize("pairing", sorted(PAIRINGS))
@pytest.mark.parametrize("name", SETS)
def test_pairing_kernel_bit_exact(rng, name, pairing):
    ps = get_params(name)
    x = rng.integers(0, ps.q, (6, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (6, ps.n), dtype=np.uint32)
    z = np.asarray(polymul_pairing_fn(name, pairing, interpret=True)(x, y))
    # vs the XLA pipeline of the SAME pairing ...
    twin = np.asarray(polymul_negacyclic(x, y, ps, algo=pairing))
    np.testing.assert_array_equal(z, twin)
    # ... and vs the independent flagship pipeline
    merged = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, merged)


@pytest.mark.parametrize("pairing", sorted(PAIRINGS))
def test_pairing_kernel_edge_operands(pairing):
    """q-1 extremes + delta impulses: worst case for the lazy [0,4q)
    bounds and the permutation networks."""
    ps = get_params("smallprime")
    n, q = ps.n, ps.q
    x = np.full((3, n), q - 1, dtype=np.uint32)
    y = np.zeros((3, n), dtype=np.uint32)
    y[0, 0] = 1                        # identity: z = x
    y[1, 1] = 1                        # shift by X: z = -x rotated
    y[2, :] = q - 1                    # dense extreme
    z = np.asarray(polymul_pairing_fn(
        "smallprime", pairing, interpret=True)(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


def test_pairing_kernel_batch_padding(rng):
    """Non-multiple-of-tile batches and leading batch dims reshape/pad
    correctly (same policy as ntt_pallas._call)."""
    ps = get_params("smallprime")
    x = rng.integers(0, ps.q, (3, 5, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (3, 5, ps.n), dtype=np.uint32)
    z = np.asarray(polymul_pairing_fn(
        "smallprime", "gs_ct", interpret=True)(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    assert z.shape == want.shape
    np.testing.assert_array_equal(z, want)


def test_pairing_kernel_via_model_dispatch(rng):
    """models.polymul_fn('<pairing>_kernel') routes to the device kernel."""
    ps = get_params("smallprime")
    x = rng.integers(0, ps.q, (4, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (4, ps.n), dtype=np.uint32)
    fn = polymul_fn("smallprime", "stockham_kernel")
    # dispatch must hand back exactly the pairing kernel factory's product
    # (both factories are lru_cached, so identity proves the routing); on
    # CPU run its interpret twin for the numeric check
    assert fn is polymul_pairing_fn("smallprime", "stockham")
    z = np.asarray(polymul_pairing_fn(
        "smallprime", "stockham", interpret=True)(x, y))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="stockham"))
    np.testing.assert_array_equal(z, want)


def test_unknown_pairing_rejected():
    with pytest.raises(ValueError, match="unknown pairing"):
        polymul_pairing_fn("smallprime", "nope")
