"""ctypes bindings for the C++ runtime helpers (native/aptai_native.cpp).

Builds on demand with ``make -C native`` (g++) on first import if the shared
library is missing; every entry point has a pure-Python fallback so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_PKG_ROOT = Path(__file__).resolve().parents[1]
_SO_PATH = _PKG_ROOT / "_native" / "libaptai_native.so"
_NATIVE_DIR = _PKG_ROOT.parent / "native"

_lib: Optional[ctypes.CDLL] = None
_build_attempted = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_attempted
    if _lib is not None:
        return _lib
    if not _SO_PATH.exists() and not _build_attempted:
        _build_attempted = True
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not _SO_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_SO_PATH))
    lib.aptai_edit_distance.restype = ctypes.c_int64
    lib.aptai_edit_distance.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.aptai_ctc_beam_search.restype = ctypes.c_int64
    lib.aptai_ctc_beam_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def load_library() -> Optional[ctypes.CDLL]:
    """The shared ``libaptai_native.so`` handle (building it on demand), or
    None without a toolchain.  Other modules binding additional entry
    points (e.g. the HTTP front end, infer/native_transport.py) attach
    their own argtypes to this same CDLL."""
    return _load()


def _edit_distance_py(a: Sequence[int], b: Sequence[int]) -> int:
    """Vectorized NumPy Levenshtein (fallback for the C++ path)."""
    a = list(a)
    b = list(b)
    if not a:
        return len(b)
    if not b:
        return len(a)
    bb = np.asarray(b)
    prev = np.arange(len(b) + 1)
    for i, ai in enumerate(a, start=1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        sub = prev[:-1] + (bb != ai)
        np.minimum(sub, prev[1:] + 1, out=sub)
        # cummin for the insertion chain
        cur[1:] = sub
        for j in range(1, len(b) + 1):  # short inner fix-up
            if cur[j - 1] + 1 < cur[j]:
                cur[j] = cur[j - 1] + 1
        prev = cur
    return int(prev[-1])


def edit_distance(a: Sequence[int], b: Sequence[int]) -> int:
    """Levenshtein distance over token ids — the PER numerator
    (``editdistance.eval``, reference utility.py:99-104)."""
    lib = _load()
    an = np.ascontiguousarray(np.asarray(a, np.int32))
    bn = np.ascontiguousarray(np.asarray(b, np.int32))
    if lib is None:
        return _edit_distance_py(an.tolist(), bn.tolist())
    return int(lib.aptai_edit_distance(
        an.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(an),
        bn.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bn),
    ))


def beam_search_native(
    log_probs: np.ndarray,
    blank: int = 0,
    beam_size: int = 10,
    beam_threshold: float = 50.0,
):
    """C++ beam search; returns ``(tokens, timesteps)`` or ``None`` if the
    native library is unavailable (caller falls back to decode.beam)."""
    lib = _load()
    if lib is None:
        return None
    lp = np.ascontiguousarray(np.asarray(log_probs, np.float32))
    t, v = lp.shape
    max_out = t + 1
    toks = np.zeros(max_out, np.int32)
    times = np.zeros(max_out, np.int32)
    n = lib.aptai_ctc_beam_search(
        lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), t, v,
        blank, beam_size, beam_threshold,
        toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        times.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_out,
    )
    return toks[:n].tolist(), times[:n].tolist()
