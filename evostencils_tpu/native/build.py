"""On-demand build + ctypes loading of the native engines."""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
import sys
import sysconfig
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_ENGINE = None
_ENGINE_FAILED = False


def _blas_candidates():
    """LAPACK+BLAS libraries exporting the standard zgemm_/zgeev_ symbols,
    fastest first: a bundled OpenBLAS (full LAPACK included) beats the
    Debian reference implementation by ~5-10x on zgemm."""
    site = sysconfig.get_paths().get("purelib", "")
    out = sorted(glob.glob(os.path.join(site, "*.libs", "libopenblas*.so*")))
    # each candidate is either self-contained (OpenBLAS) or a
    # (lapack, blas) pair
    singles = [[p] for p in out]
    ref = ["/usr/lib/x86_64-linux-gnu/liblapack.so.3",
           "/lib/x86_64-linux-gnu/liblapack.so.3"]
    refb = ["/usr/lib/x86_64-linux-gnu/libblas.so.3",
            "/lib/x86_64-linux-gnu/libblas.so.3"]
    lapack = next((p for p in ref if os.path.exists(p)), None)
    blas = next((p for p in refb if os.path.exists(p)), None)
    if lapack and blas:
        singles.append([lapack, blas])
    return singles


def _build(source: str, out: str) -> bool:
    for libs in _blas_candidates():
        if not all(os.path.exists(p) for p in libs):
            continue
        rpaths = [f"-Wl,-rpath,{os.path.dirname(p)}" for p in libs]
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared",
               "-fPIC", "-o", out, source] + libs + rpaths
        try:
            res = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            continue
        if res.returncode != 0:
            print(f"[native] build failed: {res.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        try:
            ctypes.CDLL(out)   # smoke-load (symbol resolution)
            return True
        except OSError:
            continue
    return False


def load_lfa_engine():
    """ctypes handle of the LFA engine, building it on first use; None when
    the toolchain or LAPACK is unavailable (callers fall back to numpy)."""
    global _ENGINE, _ENGINE_FAILED
    with _LOCK:
        if _ENGINE is not None or _ENGINE_FAILED:
            return _ENGINE
        src = os.path.join(_DIR, "lfa_engine.cpp")
        lib = os.path.join(_DIR, "lfa_engine.so")
        if not os.path.exists(src):
            _ENGINE_FAILED = True
            return None
        if not os.path.exists(lib) or \
                os.path.getmtime(lib) < os.path.getmtime(src):
            if not _build(src, lib):
                _ENGINE_FAILED = True
                return None
        try:
            eng = ctypes.CDLL(lib)
        except OSError:
            _ENGINE_FAILED = True
            return None
        try:
            # the engine owns the outer (per-frequency) parallelism; keep
            # any linked OpenBLAS single-threaded underneath it
            eng.openblas_set_num_threads(1)
        except AttributeError:
            pass
        eng.lfa_execute.restype = ctypes.c_int
        eng.lfa_execute.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
        _ENGINE = eng
        return _ENGINE


def lfa_engine_available() -> bool:
    return load_lfa_engine() is not None
