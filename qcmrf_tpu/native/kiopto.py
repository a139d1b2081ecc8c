"""ctypes wrapper for the native exact-inference engine.

Exposes the ``kiopto_native`` API surface the reference uses as ``px``
(SURVEY.md §1 L0: ``backend``, ``weights`` (mutable view), ``infer``,
``logpot``, ``sample``; call sites /root/reference/eval.py:33-107), backed
by qcmrf_tpu/native/kiopto.cpp. The shared library builds on first import
with g++ (no pybind11 — plain C ABI via ctypes).

Usage parity with the reference's ``import kiopto_native as px``::

    from qcmrf_tpu.native import kiopto as px
    b = px.backend(cliques, [2] * n, inference="exact")
    px.weights(b)[:] = theta          # in-place, like the reference
    lnZ = px.infer(b, task="partition")
    lp = px.logpot(b, xid)
    S = px.sample(b)                  # Gibbs chain, thin with S[::10][1:]
    S = px.sample(b, pam=True)        # perturb-and-MAP
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kiopto.cpp")
_SO = os.path.join(_HERE, "libqcmrf_native.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not os.path.isfile(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        lib.qk_create.restype = ctypes.c_void_p
        lib.qk_create.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int,
        ]
        lib.qk_destroy.argtypes = [ctypes.c_void_p]
        lib.qk_dim.restype = ctypes.c_longlong
        lib.qk_dim.argtypes = [ctypes.c_void_p]
        lib.qk_num_vars.restype = ctypes.c_int
        lib.qk_num_vars.argtypes = [ctypes.c_void_p]
        lib.qk_weights.restype = ctypes.POINTER(ctypes.c_double)
        lib.qk_weights.argtypes = [ctypes.c_void_p]
        lib.qk_logpot.restype = ctypes.c_double
        lib.qk_logpot.argtypes = [ctypes.c_void_p, ctypes.c_ulonglong]
        lib.qk_partition.restype = ctypes.c_double
        lib.qk_partition.argtypes = [ctypes.c_void_p]
        lib.qk_map.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int)]
        lib.qk_sample_gibbs.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_ulonglong,
        ]
        lib.qk_sample_pam.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_ulonglong,
        ]
        _LIB = lib
        return lib


class Backend:
    """Handle to a native MRF (reference: object from ``px.backend``)."""

    def __init__(self, cliques: Sequence[Sequence[int]],
                 num_vars: int = 0):
        lib = _lib()
        if any(len(C) == 0 for C in cliques):
            raise ValueError("empty cliques are not allowed (their weight "
                             "would be dropped from elimination but kept "
                             "by logpot)")
        flat: List[int] = [int(v) for C in cliques for v in C]
        sizes = [len(C) for C in cliques]
        self._h = lib.qk_create(
            (ctypes.c_int * len(flat))(*flat),
            (ctypes.c_int * len(sizes))(*sizes),
            len(sizes), int(num_vars),
        )
        self._lib = lib
        self.cliques = [list(map(int, C)) for C in cliques]

    def __del__(self):
        try:
            self._lib.qk_destroy(self._h)
        except Exception:
            pass

    @property
    def n(self) -> int:
        return self._lib.qk_num_vars(self._h)

    @property
    def dim(self) -> int:
        return int(self._lib.qk_dim(self._h))


def backend(cliques, states_per_var=None, inference: str = "exact") -> Backend:
    """Create a native MRF backend (parity: ``px.backend``, eval.py:33).

    Only binary variables are supported — exactly the reference's usage
    (``[2]*n`` at every call site)."""
    num_vars = 0
    if states_per_var is not None:
        spv = np.asarray(states_per_var).flatten()
        if any(int(s) != 2 for s in spv):
            raise ValueError("only binary variables are supported")
        # the reference kiopto takes n from len(states_per_var): trailing
        # variables in no clique are real (each contributes a factor 2 to
        # Z, a bit of sample width, a logpot bit position)
        num_vars = len(spv)
    if inference != "exact":
        raise ValueError("only inference='exact' is supported")
    return Backend(cliques, num_vars)


class _WeightsView(np.ndarray):
    """ndarray subclass that keeps its Backend alive (the view aliases the
    C++ heap buffer; without the reference, `px.weights(px.backend(...))`
    would dangle as soon as the temporary Backend is collected)."""

    _qk_backend = None


def weights(b: Backend) -> np.ndarray:
    """Mutable view of the weight vector (parity: ``px.weights``,
    eval.py:86-87 writes through it in place)."""
    ptr = b._lib.qk_weights(b._h)
    arr = np.ctypeslib.as_array(ptr, shape=(b.dim,)).view(_WeightsView)
    arr._qk_backend = b
    return arr


def infer(b: Backend, task: str = "partition") -> float:
    """ln Z via bucket elimination (parity: ``px.infer``, eval.py:88)."""
    if task != "partition":
        raise ValueError("only task='partition' is supported")
    return float(b._lib.qk_partition(b._h))


def logpot(b: Backend, xid: int) -> float:
    """theta^T phi(x) for a state id (parity: ``px.logpot``, eval.py:92)."""
    if b.n > 64:
        raise ValueError("packed state ids are 64-bit; logpot supports "
                         "n <= 64 (partition/MAP/sampling have no limit)")
    return float(b._lib.qk_logpot(b._h, int(xid)))


def map_state(b: Backend) -> np.ndarray:
    out = (ctypes.c_int * b.n)()
    b._lib.qk_map(b._h, out)
    return np.asarray(out, dtype=np.int32)


def sample(b: Backend, pam: bool = False, num: int = None,
           seed: int = 0) -> np.ndarray:
    """Samples as (num, n) bit arrays in variable order (parity:
    ``px.sample``; the reference thins Gibbs output ``S[::10][1:]`` to get
    10 000 samples, eval.py:96-98, so the Gibbs default emits 100 010 raw
    sweeps; PAM returns 10 000 directly, eval.py:107)."""
    if pam:
        num = 10_000 if num is None else num
        out = (ctypes.c_int * (num * b.n))()
        b._lib.qk_sample_pam(b._h, num, out, seed)
    else:
        num = 100_010 if num is None else num
        out = (ctypes.c_int * (num * b.n))()
        b._lib.qk_sample_gibbs(b._h, num, 10, out, seed)
    return np.asarray(out, dtype=np.int32).reshape(num, b.n)
