"""Real-TPU device lane: the Mosaic-COMPILED kernels (not interpret mode)
against the jnp pipelines and adversarial operands, on actual hardware.

The regular suite pins JAX_PLATFORMS=cpu and only ever runs the Pallas
kernels through the interpreter; a class of bugs exists that only Mosaic
catches (docs/PERF_NOTES.md: "Changing bitwidths not supported") and a class
of miscompiles only hardware exposes.  This file is the opt-in lane:

    QTESLA_TPU_TESTS=1 python -m pytest tests/test_tpu_device.py -q

Run it ALONE (the rest of the suite is written for the 8-virtual-CPU mesh).
Covers every parameter set x {mxu, fused} x {random full-range, adversarial
all-(q-1)} operands, fixed-operand variants, transform round-trips, and
ragged/tiny batches, each bit-exact vs the merged jnp pipeline (itself
oracle-validated in the CPU suite)."""

import os

import numpy as np
import pytest

_lane = os.environ.get("QTESLA_TPU_TESTS") == "1"
if _lane:
    import jax
    _lane = jax.default_backend() == "tpu"

pytestmark = pytest.mark.skipif(
    not _lane, reason="TPU device lane: set QTESLA_TPU_TESTS=1 on a TPU "
                      "host and run this file alone")

SETS = ["smallprime", "qtesla-i", "qtesla-iii-speed", "qtesla-p-i",
        "qtesla-p-iii"]


def _operands(name, batch=64, seed=0):
    from qtesla_tpu.params import get_params
    ps = get_params(name)
    rng = np.random.default_rng(seed)
    x = rng.integers(0, ps.q, (batch, ps.n), dtype=np.uint32)
    y = rng.integers(0, ps.q, (batch, ps.n), dtype=np.uint32)
    # adversarial rows: all q-1 (worst-case laziness bounds) and all zeros
    x[0, :] = ps.q - 1
    y[0, :] = ps.q - 1
    x[1, :] = 0
    return ps, x, y


@pytest.mark.parametrize("name", SETS)
@pytest.mark.parametrize("algo", ["mxu", "fused"])
def test_polymul_kernels_on_device(name, algo):
    from qtesla_tpu.models import polymul_negacyclic
    ps, x, y = _operands(name)
    z = np.asarray(polymul_negacyclic(x, y, ps, algo=algo))
    want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", ["qtesla-iii-speed", "qtesla-p-iii"])
@pytest.mark.parametrize("algo", ["mxu", "mxu-folded", "fused"])
def test_fixed_operand_on_device(name, algo):
    import jax.numpy as jnp
    from qtesla_tpu.models import polymul_fixed_fn, polymul_negacyclic
    ps, x, _ = _operands(name, batch=33)    # ragged: exercises pad path
    rng = np.random.default_rng(7)
    a = rng.integers(0, ps.q, (ps.n,), dtype=np.uint32)
    prep, mul = polymul_fixed_fn(name, algo)
    z = np.asarray(mul(jnp.asarray(x), prep(jnp.asarray(a))))
    want = np.asarray(polymul_negacyclic(
        x, np.broadcast_to(a, x.shape), ps, algo="merged"))
    np.testing.assert_array_equal(z, want)


@pytest.mark.parametrize("name", SETS)
def test_roundtrip_on_device(name):
    import jax.numpy as jnp
    from qtesla_tpu.ops.ntt_mxu import intt_mxu_fn, ntt_mxu_fn
    from qtesla_tpu.ops.ntt_pallas import intt_fused_fn, ntt_fused_fn
    ps, x, _ = _operands(name, batch=16)
    xj = jnp.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(intt_mxu_fn(name)(ntt_mxu_fn(name)(xj))), x)
    np.testing.assert_array_equal(
        np.asarray(intt_fused_fn(name)(ntt_fused_fn(name)(xj))), x)


@pytest.mark.parametrize("name", SETS)
def test_device_vs_host_oracle(name):
    """Closure against a HOST-computed oracle: one small batch per set
    checked directly vs the C++ (or big-int) schoolbook multiplier, so the
    lane fails even if XLA:TPU miscompiled the jnp `merged` pipeline that
    the other tests use as truth (round-2 VERDICT item 7 — device-run
    `merged` as truth is a correlated-miscompile blind spot)."""
    from qtesla_tpu.models import polymul_negacyclic
    from qtesla_tpu.utils import native
    ps, x, y = _operands(name, batch=6)
    if native.native_available():
        want = native.negacyclic_schoolbook(x, y, ps.q)
    else:
        from qtesla_tpu.oracle import negacyclic_schoolbook
        want = np.stack([negacyclic_schoolbook(x[b], y[b], ps)
                         for b in range(x.shape[0])]).astype(np.uint32)
    for algo in ("merged", "mxu"):
        z = np.asarray(polymul_negacyclic(x, y, ps, algo=algo))
        np.testing.assert_array_equal(z, want, err_msg=f"algo={algo}")


def test_nussbaumer_on_device():
    """The paper's title algorithm, XLA-compiled on real hardware, vs the
    host oracle (reference NTT.cu:147-277, test NTT.cu:1987-2005)."""
    from qtesla_tpu.models import polymul_negacyclic
    from qtesla_tpu.utils import native
    name = "qtesla-iii-speed"
    ps, x, y = _operands(name, batch=4)
    if native.native_available():
        want = native.negacyclic_schoolbook(x, y, ps.q)
    else:
        from qtesla_tpu.oracle import negacyclic_schoolbook
        want = np.stack([negacyclic_schoolbook(x[b], y[b], ps)
                         for b in range(x.shape[0])]).astype(np.uint32)
    z = np.asarray(polymul_negacyclic(x, y, ps, algo="nussbaumer"))
    np.testing.assert_array_equal(z, want)


def test_tiny_and_ragged_batches_on_device():
    from qtesla_tpu.models import polymul_negacyclic
    from qtesla_tpu.params import get_params
    ps = get_params("qtesla-iii-speed")
    rng = np.random.default_rng(5)
    for batch in (1, 2, 5, 100):
        x = rng.integers(0, ps.q, (batch, ps.n), dtype=np.uint32)
        y = rng.integers(0, ps.q, (batch, ps.n), dtype=np.uint32)
        z = np.asarray(polymul_negacyclic(x, y, ps, algo="mxu"))
        want = np.asarray(polymul_negacyclic(x, y, ps, algo="merged"))
        np.testing.assert_array_equal(z, want)


def test_sp_segment_kernels_on_device():
    """The sharded four-step segment kernels, Mosaic-compiled on real
    hardware (no shard_map — single-chip runs of each per-device kernel
    against exact numpy object-int matrix arithmetic).  Segment outputs
    are LAZY (stored unreduced, round-3 design): checks are congruence
    mod q plus the plan's static store bound; seg3 output is canonical."""
    import jax.numpy as jnp
    from qtesla_tpu.parallel import sharded_mxu as SM
    from qtesla_tpu.params import get_params

    name = "qtesla-iii-speed"
    ps = get_params(name)
    q = ps.q
    k = 4
    n1 = 1 << (ps.logn // 2)
    plans = SM.fourstep_mxu_plans(name, n1, k)
    nloc = plans.nloc
    rng = np.random.default_rng(11)
    B = 16
    x = rng.integers(0, q, (B, nloc), dtype=np.uint32)
    y = rng.integers(0, q, (B, nloc), dtype=np.uint32)

    def matmod(v, M):
        return ((v.astype(object) @ M.astype(object)) % q)

    def assert_lazy_equal(out, want_obj, bound):
        assert out.max() < bound
        np.testing.assert_array_equal(out.astype(object) % q,
                                      want_obj % q)

    # independent dense per-device matrices from the mathematical spec
    # (NOT from the plans): seg1 output position p holds the k1map[p]
    # spectral row, so M1[:, (p, lam)] = phi * R1[:, k1map[p]] * W[k1map].
    from qtesla_tpu.parallel.sharded import _fourstep_tables
    from qtesla_tpu.ops.ntt import _subtables
    T = _fourstep_tables(name, n1)
    n2 = ps.n // n1
    n2k, n1k = n2 // k, n1 // k
    R1 = SM._transform_matrix(_subtables(name, n1), inverse=False)
    k1map = plans.k1map
    d = 1                                   # exercise a non-trivial device
    M1 = np.zeros((nloc, nloc), dtype=object)
    for j2l in range(n2k):
        j2g = d * n2k + j2l
        col = (T["phi"].astype(object)[:, j2g, None]
               * R1[:, k1map]                       # position-permuted
               * T["W"].astype(object)[k1map, j2g][None, :]) % q
        M1[j2l::n2k, j2l::n2k] = col

    seg1 = SM._make_seg1(plans, 256, False)
    out = np.asarray(seg1(jnp.asarray(x),
                          jnp.asarray(plans.p1.W[d:d + 1]),
                          jnp.asarray(plans.p1.const[d:d + 1])))
    assert_lazy_equal(out, matmod(x, M1), plans.p1.store_bound)

    # segment 2: row NTTs + pointwise + inverse row (device d, all rows;
    # row r holds position p = d*n1k + r -> Winv[k1map[p]])
    R2 = SM._transform_matrix(_subtables(name, n2), inverse=False)
    R2i = SM._transform_matrix(_subtables(name, n2), inverse=True)
    seg2 = SM._make_seg2(plans, 256, False)
    out2 = np.asarray(seg2(jnp.asarray(x), jnp.asarray(y),
                           jnp.asarray(plans.p2f.W),
                           jnp.asarray(plans.p2f.const),
                           jnp.asarray(plans.p2i.W[d:d + 1]),
                           jnp.asarray(plans.p2i.const[d:d + 1])))
    want2 = np.zeros((B, nloc), dtype=object)
    for r in range(n1k):
        k1 = int(k1map[d * n1k + r])
        sl = slice(r * n2, (r + 1) * n2)
        X = matmod(x[:, sl], R2)
        Y = matmod(y[:, sl], R2)
        Z = (X * Y) % q
        Mi = (R2i * T["Winv"].astype(object)[None, k1, :]) % q
        want2[:, sl] = (Z @ Mi) % q
    assert_lazy_equal(out2, want2, plans.p2i.store_bound)

    # segment 3: inverse column transform consuming position-indexed rows;
    # exact inverse built from the merged-forward spec: out = v @ M3 with
    # M3[(p, lam), (j1, lam)] = n1^{-1} psi1^{-j1} om1^{-j1*k1map[p]}
    # * psi^{-j2g}.  Canonical output.
    t1ps = _subtables(name, n1).ps
    psi1_inv = pow(int(t1ps.psi), -1, q)
    om1_inv = pow(int(t1ps.omega), -1, q)
    n1_inv = pow(n1, -1, q)
    M3 = np.zeros((nloc, nloc), dtype=object)
    for j2l in range(n2k):
        j2g = d * n2k + j2l
        blk = np.zeros((n1, n1), dtype=object)
        for p in range(n1):
            for j1 in range(n1):
                blk[p, j1] = (n1_inv * pow(psi1_inv, j1, q)
                              * pow(om1_inv, j1 * int(k1map[p]), q)
                              * pow(int(ps.psi), -j2g, q)) % q
        M3[j2l::n2k, j2l::n2k] = blk
    seg3 = SM._make_seg3(plans, 256, False)
    out3 = np.asarray(seg3(jnp.asarray(x),
                           jnp.asarray(plans.p3.W[d:d + 1]),
                           jnp.asarray(plans.p3.const[d:d + 1])))
    np.testing.assert_array_equal(
        out3.astype(object), matmod(x, M3))

    # round-4 folded fixed segment 2: Mosaic-compiled seg2x must equal the
    # exact F = K2f @ diag(A-hat) @ K2i composition (device d, lazy out)
    spec = rng.integers(0, q, (k, nloc), dtype=np.uint32)
    Wf, cf = SM.fourstep_fold_tables(plans, spec)
    seg2x = SM._make_seg2_folded(plans, 256, False)
    outx = np.asarray(seg2x(jnp.asarray(x), jnp.asarray(Wf[d:d + 1]),
                            jnp.asarray(cf[d:d + 1])))
    wantx = np.zeros((B, nloc), dtype=object)
    dg = spec[d].astype(object)
    for bb in range(plans.A):
        ts = slice(bb * plans.TW, (bb + 1) * plans.TW)
        F = (plans.K2f * dg[ts][None, :]) % q
        F = (F.astype(object) @ plans.K2i[d, bb].astype(object)) % q
        wantx[:, ts] = matmod(x[:, ts], F)
    assert_lazy_equal(outx, wantx, plans.p2x.store_bound)


def test_classes_boundary_kernels_on_device():
    """Round-5 class-sum boundary kernels (seg1-classes producer and
    seg2-classes consumer), Mosaic-compiled on real hardware vs their own
    interpret-mode twins — the layout-sensitive biased class-plane store
    and the per-class multi-split consume are exactly the code a Mosaic
    miscompile would corrupt.  (The full a2a path is CPU-mesh-tested in
    test_sharded.py; one chip cannot host the model=k mesh.)"""
    import jax.numpy as jnp
    from qtesla_tpu.parallel import sharded_mxu as SM
    from qtesla_tpu.params import get_params

    name = "qtesla-iii-speed"
    ps = get_params(name)
    k = 4
    n1 = 1 << (ps.logn // 2)
    plans = SM.fourstep_mxu_plans(name, n1, k)
    cp = SM.class_boundary_plan(name, n1, k)
    tb = SM._default_tile(plans.nloc)
    rng = np.random.default_rng(5)
    B = 32
    x = rng.integers(0, ps.q, (B, plans.nloc), dtype=np.uint32)
    x[0, :] = ps.q - 1
    w1 = jnp.asarray(plans.p1.W[1:2])
    cK = jnp.asarray(cp.const[1:2])
    wi = jnp.asarray(plans.p2i.W[1:2])
    ci = jnp.asarray(plans.p2i.const[1:2])
    for interp in (False, True):
        seg1c = SM._make_seg1_classes(plans, cp, tb, interp)
        u = np.asarray(seg1c(jnp.asarray(x), w1))
        if interp:
            np.testing.assert_array_equal(u, u_dev)
        else:
            u_dev = u
    uj = jnp.asarray(u_dev)
    for interp in (False, True):
        seg2c = SM._make_seg2_classes(plans, cp, tb, interp)
        w = np.asarray(seg2c(uj, uj, *cp.W, cK, wi, ci))
        if interp:
            np.testing.assert_array_equal(w, w_dev)
        else:
            w_dev = w
