"""ctypes bindings for the native host data-loader (native/koemorph_host.cpp).

The C++ library accelerates the two host-side hot paths of corpus loading —
WAV decode (libsndfile's role in the reference, src/data/io.py:71) and
blendshape-JSONL parsing (src/data/io.py:98-155). The library is built on
first use with ``make -C native`` (g++ is in the image); every caller MUST
fall back to the pure-Python implementation when ``HAS_NATIVE`` is False or
a native call returns an error — Python owns the error/validation semantics.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["HAS_NATIVE", "native_lib", "decode_wav_native",
           "parse_blendshape_jsonl_native"]

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libkoemorph_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


class _KmWavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits_per_sample", ctypes.c_int32),
        ("audio_format", ctypes.c_int32),
        ("n_frames", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
        ("data_size", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _SO_PATH.exists()
    except Exception as e:  # pragma: no cover - toolchain issues
        logger.info("native build unavailable: %s", e)
        return False


def native_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO_PATH.exists() and not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError as e:  # pragma: no cover
            logger.info("native load failed: %s", e)
            return None
        lib.km_wav_info.restype = ctypes.c_int64
        lib.km_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_KmWavInfo)]
        lib.km_wav_decode.restype = ctypes.c_int64
        lib.km_wav_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_KmWavInfo),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
        lib.km_parse_blendshape_jsonl.restype = ctypes.c_int64
        lib.km_parse_blendshape_jsonl.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32]
        lib.km_count_lines.restype = ctypes.c_int64
        lib.km_count_lines.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
        return _lib


def decode_wav_native(raw: bytes, *, mono: bool = False
                      ) -> Optional[tuple[np.ndarray, int]]:
    """WAV bytes -> (float32 audio, sample_rate); None -> use Python path."""
    lib = native_lib()
    if lib is None:
        return None
    info = _KmWavInfo()
    if lib.km_wav_info(raw, len(raw), ctypes.byref(info)) != 0:
        return None
    frames, ch = info.n_frames, info.channels
    mix = 1 if (mono and ch > 1) else 0
    out = np.empty(frames if mix else frames * ch, np.float32)
    got = lib.km_wav_decode(
        raw, len(raw), ctypes.byref(info),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), mix)
    if got != frames:
        return None
    if not mix and ch > 1:
        out = out.reshape(frames, ch)
    return out, int(info.sample_rate)


def parse_blendshape_jsonl_native(
        raw: bytes, n_coeffs: int = 52
) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """JSONL bytes -> (blendshapes (T, n), timestamps (T,)); None on any
    irregular line (caller falls back to the strict Python loader)."""
    lib = native_lib()
    if lib is None:
        return None
    n_lines = lib.km_count_lines(raw, len(raw))
    if n_lines <= 0:
        return None
    ts = np.empty(n_lines, np.float64)
    bs = np.empty((n_lines, n_coeffs), np.float32)
    got = lib.km_parse_blendshape_jsonl(
        raw, len(raw),
        ts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        bs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_lines, n_coeffs)
    if got <= 0:
        return None
    return bs[:got], ts[:got]
