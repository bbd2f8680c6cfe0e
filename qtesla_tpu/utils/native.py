"""ctypes bindings for the native C++ oracle (csrc/oracle.cpp).

Builds csrc/liboracle.so on demand with `make` the first time it's needed
(the reference ships native CPU reference code compiled into its binary;
here it's a side-car shared library).  All entry points gracefully raise
NativeOracleUnavailable if no toolchain is present, so the pure-Python
big-int oracle remains the fallback.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess

import numpy as np

__all__ = ["native_available", "negacyclic_schoolbook", "ntt_naive",
           "intt_naive", "negacyclic_schoolbook_ring", "polymul_ntt",
           "NativeOracleUnavailable"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB = os.path.join(_CSRC, "liboracle.so")


class NativeOracleUnavailable(RuntimeError):
    pass


@functools.lru_cache(maxsize=1)
def _lib():
    if not os.path.exists(_LIB):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError) as e:
            raise NativeOracleUnavailable(
                f"could not build {_LIB}: {e}") from e
    lib = ctypes.CDLL(_LIB)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u32 = ctypes.c_uint32
    lib.oracle_negacyclic_schoolbook.argtypes = [u32p, u32p, u32p, u32, u32]
    lib.oracle_negacyclic_schoolbook_batch.argtypes = [u32p, u32p, u32p,
                                                       u32, u32, u32]
    lib.oracle_ntt_naive.argtypes = [u32p, u32p, u32, u32, u32]
    lib.oracle_intt_naive.argtypes = [u32p, u32p, u32, u32, u32]
    lib.oracle_negacyclic_schoolbook_ring.argtypes = [u32p, u32p, u32p, u32]
    lib.oracle_polymul_ntt.argtypes = [u32p, u32p, u32p, u32, u32, u32]
    return lib


def native_available() -> bool:
    try:
        _lib()
        return True
    except NativeOracleUnavailable:
        return False


def _u32c(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.uint32))


def _ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def negacyclic_schoolbook(x, y, q: int) -> np.ndarray:
    """Batched schoolbook negacyclic product mod q: (..., n) arrays."""
    x, y = _u32c(x), _u32c(y)
    assert x.shape == y.shape
    n = x.shape[-1]
    batch = int(np.prod(x.shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    z = np.empty_like(x)
    _lib().oracle_negacyclic_schoolbook_batch(
        _ptr(x.reshape(-1)), _ptr(y.reshape(-1)), _ptr(z.reshape(-1)),
        batch, n, q)
    return z


def ntt_naive(x, q: int, omega: int) -> np.ndarray:
    x = _u32c(x)
    out = np.empty_like(x)
    _lib().oracle_ntt_naive(_ptr(x), _ptr(out), x.shape[-1], q, omega)
    return out


def intt_naive(X, q: int, omega: int) -> np.ndarray:
    X = _u32c(X)
    out = np.empty_like(X)
    _lib().oracle_intt_naive(_ptr(X), _ptr(out), X.shape[-1], q, omega)
    return out


def negacyclic_schoolbook_ring(x, y) -> np.ndarray:
    x, y = _u32c(x), _u32c(y)
    z = np.empty_like(x)
    _lib().oracle_negacyclic_schoolbook_ring(_ptr(x), _ptr(y), _ptr(z),
                                             x.shape[-1])
    return z


def polymul_ntt(x, y, q: int, psi: int) -> np.ndarray:
    x, y = _u32c(x), _u32c(y)
    z = np.empty_like(x)
    _lib().oracle_polymul_ntt(_ptr(x), _ptr(y), _ptr(z), x.shape[-1], q, psi)
    return z
