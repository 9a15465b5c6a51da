"""Recording backend for the native (C++) LFA engine.

Implements the same interface as lfa_backend.NumpyLfaBackend but records a
compact instruction tape instead of computing; ``spectral_radius`` packs
the tape and runs it in native/lfa_engine.cpp (OpenMP over frequency
samples, BLAS/LAPACK kernels).  Plays the role the C++ LFA Lab library
plays for the reference (model_based_prediction/convergence.py:176-196).
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Tuple

import numpy as np

from .lfa_backend import Handle
from ..native import load_lfa_engine

_OP_CIRCULANT = 1
_OP_SELECTION = 2
_OP_EMBEDDING = 3
_OP_DIAG = 4
_OP_IDENTITY = 5
_OP_ZERO = 6
_OP_MATMUL = 7
_OP_ADD = 8
_OP_SUB = 9
_OP_SCALE = 10
_OP_INV = 11
_OP_KRONEYE = 12
_OP_BLOCK = 13
_OP_EIGMAX = 14


class NativeLfaBackend:
    #: 'exact' = LAPACK zgeev; 'power' = squaring + power iteration
    #: (~1e-4 relative, much cheaper); 'auto' = power for symbols >= 128
    def __init__(self, thetas: np.ndarray, n_threads: int = 0,
                 rho_method: str = "auto"):
        self.thetas = np.ascontiguousarray(thetas, dtype=np.float64)
        self.n_theta, self.dim = self.thetas.shape
        self.n_threads = n_threads
        self.rho_method = rho_method
        self._instrs: List[Tuple[int, ...]] = []   # 8-tuples
        self._payload: List[float] = []
        self._n_slots = 0

    # -- recording helpers ----------------------------------------------------

    def _slot(self) -> int:
        s = self._n_slots
        self._n_slots += 1
        return s

    def _emit(self, op, out, a, b, rows, cols, payload=()):
        poff = len(self._payload)
        self._payload.extend(payload)
        self._instrs.append((op, out, a, b, rows, cols, poff,
                             len(self._payload) - poff))
        return Handle(rows, cols, out)

    # -- leaves --------------------------------------------------------------

    def circulant(self, entries, rel: int, n: int) -> Handle:
        payload = []
        for x_idx, y_idx, offset, value in entries:
            c = complex(value)
            payload.extend((float(x_idx), float(y_idx)))
            payload.extend(float(o) for o in offset)
            payload.extend((c.real, c.imag))
        return self._emit(_OP_CIRCULANT, self._slot(), rel, 0, n, n, payload)

    def selection(self, pairs, rel_fine: int, nc: int, nf: int) -> Handle:
        payload = [float(v) for p in pairs for v in p]
        return self._emit(_OP_SELECTION, self._slot(), rel_fine, 0, nc, nf,
                          payload)

    def embedding(self, pairs, rel_fine: int, nc: int, nf: int) -> Handle:
        payload = [float(v) for p in pairs for v in p]
        return self._emit(_OP_EMBEDDING, self._slot(), rel_fine, 0, nf, nc,
                          payload)

    def diag(self, values) -> Handle:
        values = np.asarray(values, dtype=np.float64)
        n = len(values)
        return self._emit(_OP_DIAG, self._slot(), 0, 0, n, n,
                          values.tolist())

    def identity(self, n: int) -> Handle:
        return self._emit(_OP_IDENTITY, self._slot(), 0, 0, n, n)

    def zero(self, rows: int, cols: int) -> Handle:
        return self._emit(_OP_ZERO, self._slot(), 0, 0, rows, cols)

    # -- algebra -------------------------------------------------------------

    def matmul(self, a: Handle, b: Handle) -> Handle:
        if a.cols != b.rows:
            raise ValueError("matmul shape mismatch")
        return self._emit(_OP_MATMUL, self._slot(), a.ref, b.ref,
                          a.rows, b.cols)

    def add(self, a: Handle, b: Handle) -> Handle:
        return self._emit(_OP_ADD, self._slot(), a.ref, b.ref, a.rows, a.cols)

    def sub(self, a: Handle, b: Handle) -> Handle:
        return self._emit(_OP_SUB, self._slot(), a.ref, b.ref, a.rows, a.cols)

    def scale(self, alpha, a: Handle) -> Handle:
        c = complex(alpha)
        return self._emit(_OP_SCALE, self._slot(), a.ref, 0, a.rows, a.cols,
                          (c.real, c.imag))

    def inv(self, a: Handle) -> Handle:
        if a.rows != a.cols:
            raise ValueError("inverse of non-square symbol")
        return self._emit(_OP_INV, self._slot(), a.ref, 0, a.rows, a.cols)

    def kron_eye(self, nf: int, a: Handle) -> Handle:
        return self._emit(_OP_KRONEYE, self._slot(), a.ref, nf,
                          nf * a.rows, nf * a.cols)

    def block(self, mf: int, n: int, blocks: Dict[Tuple[int, int], Handle]) \
            -> Handle:
        payload = []
        for (i, j), h in blocks.items():
            payload.extend((float(i), float(j), float(h.ref)))
        return self._emit(_OP_BLOCK, self._slot(), mf, n, mf * n, mf * n,
                          payload)

    # -- results -------------------------------------------------------------

    def spectral_radius(self, a: Handle) -> float:
        if a.rows != a.cols:
            raise ValueError("spectral radius of non-square symbol")
        fast = (self.rho_method == "power"
                or (self.rho_method == "auto" and a.rows >= 128))
        self._emit(_OP_EIGMAX, 0, a.ref, 1 if fast else 0, a.rows, a.cols)
        engine = load_lfa_engine()
        if engine is None:
            raise RuntimeError("native LFA engine unavailable")
        code = np.asarray(self._instrs, dtype=np.int64).reshape(-1)
        payload = np.asarray(self._payload, dtype=np.float64)
        if payload.size == 0:
            payload = np.zeros(1, dtype=np.float64)
        rho = ctypes.c_double(0.0)
        status = engine.lfa_execute(
            self.thetas.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self.n_theta, self.dim,
            code.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self._instrs),
            payload.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            self._n_slots, self.n_threads, ctypes.byref(rho))
        if status != 0:
            raise RuntimeError(f"native LFA engine failed (status {status})")
        return float(rho.value)

    def eigenvalues(self, a: Handle) -> np.ndarray:
        raise NotImplementedError(
            "eigenvalues need the numpy backend (symbol materialization)")
