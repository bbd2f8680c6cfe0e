"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports, so multi-chip sharding logic (parallel/) is exercised without a pod
(SURVEY.md §4: multi-device tests via xla_force_host_platform_device_count)."""

import os

# Force-assign (not setdefault): the environment's sitecustomize exports
# JAX_PLATFORMS=axon, which would silently put tests on the real TPU.
# Opt-out lane: QTESLA_TPU_TESTS=1 leaves the platform alone so
# tests/test_tpu_device.py can exercise the Mosaic-compiled kernels on real
# hardware (run it alone: QTESLA_TPU_TESTS=1 pytest tests/test_tpu_device.py).
_TPU_LANE = os.environ.get("QTESLA_TPU_TESTS") == "1"
if not _TPU_LANE:
    os.environ["JAX_PLATFORMS"] = "cpu"
# sitecustomize may already have imported jax, making env vars too late —
# jax.config.update still works post-import.
# Persistent compilation cache: the first nontrivial compile in a fresh
# process otherwise pays a large one-time cost in this environment.
_here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_here, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    # sitecustomize may already have imported jax, making env vars too late
    jax.config.update("jax_platforms", "cpu")
    # ... including XLA_FLAGS: sitecustomize's import initializes the XLA
    # runtime, so the device-count flag above is silently ignored and a
    # bare `pytest tests/` used to run with ONE cpu device, skipping all
    # 26 mesh tests (needs8).  jax_num_cpu_devices works post-import.
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass                 # older jax: XLA_FLAGS (above) handles it

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xA1CE)
