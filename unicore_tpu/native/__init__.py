"""ctypes bindings for the native host runtime (fastio.cpp).

Build: `python -m unicore_tpu.native.build` (or make -C unicore_tpu/native).
Every entry point has a pure-Python fallback; absence of the .so never
breaks the pipeline, it only slows the host-side data path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(os.path.dirname(__file__), "libufio.so")
    if not os.path.isfile(so) and not os.environ.get("UNICORE_TPU_NO_NATIVE_BUILD"):
        # lazy one-shot build (~2 s with g++): a missing .so otherwise
        # silently pins the featurizer to the Python fallback for the
        # whole process
        try:
            import subprocess
            import sys
            subprocess.run(
                [sys.executable, "-m", "unicore_tpu.native.build"],
                capture_output=True, timeout=120, check=False,
            )
        except Exception:
            pass
    if not os.path.isfile(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.ufio_version.restype = ctypes.c_int
        if lib.ufio_version() != 1:
            return None
        lib.ufio_count_fasta.restype = ctypes.c_long
        lib.ufio_count_fasta.argtypes = [ctypes.c_char_p]
        lib.ufio_featurize.restype = ctypes.c_int
        lib.ufio_featurize.argtypes = [
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def featurize_native(
    code_arrays, k: int, dim: int, channel: int, out: np.ndarray, nthreads: int = 0
) -> bool:
    """Accumulate binary hashed k-mer bags into `out` (N, dim) float32.

    Returns False when the native library is unavailable.
    """
    lib = _lib()
    if lib is None:
        return False
    n = len(code_arrays)
    lens = np.array([len(c) for c in code_arrays], dtype=np.int32)
    offsets = np.zeros(n, dtype=np.int64)
    if n > 1:
        offsets[1:] = np.cumsum(lens[:-1])
    concat = np.concatenate([c.astype(np.int8) for c in code_arrays]) if n else np.zeros(0, np.int8)
    if nthreads <= 0:
        nthreads = os.cpu_count() or 1
    lib.ufio_featurize(
        concat.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n, k, dim, channel,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nthreads,
    )
    return True
