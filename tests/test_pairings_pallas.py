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

# Interpret mode pays per-op emulation cost, so the (set, pairing) matrix
# is tiered explicitly, ONE tier mark per combination: the default tier
# covers the two structurally distinct kernels at the cheap set (gs_ct:
# the reversal-free headline pairing; stockham: the rotation network);
# the other smallprime pairings and the full qtesla-i matrix are the slow
# tier; the qtesla-iii-speed (n=1024) matrix is exhaustive.
FAST_PAIRINGS = ("gs_ct", "stockham")
SETS = ["smallprime", "qtesla-i", "qtesla-iii-speed"]


def _tier(name, pairing):
    if name == "qtesla-iii-speed":
        return pytest.param(name, pairing, marks=pytest.mark.exhaustive)
    if name == "qtesla-i" or pairing not in FAST_PAIRINGS:
        return pytest.param(name, pairing, marks=pytest.mark.slow)
    return pytest.param(name, pairing)


@pytest.mark.parametrize("name,pairing",
                         [_tier(n, p) for n in SETS
                          for p in sorted(PAIRINGS)])
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


@pytest.mark.parametrize("pairing", [
    pytest.param(p, marks=pytest.mark.slow) for p in sorted(PAIRINGS)])
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


def test_pairing_kernel_via_model_dispatch():
    """models.polymul_fn('<pairing>_kernel') routes to the device kernel:
    both factories are lru_cached, so object identity proves the routing
    (advisor round 4 — the old `is not None` assert was vacuous).  The
    kernel's numerics are covered by
    test_pairing_kernel_bit_exact[smallprime-stockham]."""
    for pairing in sorted(PAIRINGS):
        fn = polymul_fn("smallprime", f"{pairing}_kernel")
        assert fn is polymul_pairing_fn("smallprime", pairing), pairing


def test_unknown_pairing_rejected():
    with pytest.raises(ValueError, match="unknown pairing"):
        polymul_pairing_fn("smallprime", "nope")
