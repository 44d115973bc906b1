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
           "parse_blendshape_jsonl_native", "emit_frames_udp_native",
           "format_frames_jsonl_native"]

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
        try:
            lib.km_emit_frames_udp.restype = ctypes.c_int64
            lib.km_emit_frames_udp.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double, ctypes.c_int32,
                ctypes.c_char_p, ctypes.c_int32]
            lib.km_format_frames_jsonl.restype = ctypes.c_int64
            lib.km_format_frames_jsonl.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double, ctypes.c_char_p,
                ctypes.c_int64]
        except AttributeError:  # stale .so without the emit entry points
            logger.info("native emit entry points missing; rebuild with "
                        "`make -C native` to accelerate serving output")
            lib.km_emit_frames_udp = None
            lib.km_format_frames_jsonl = None
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


def _frames_c(frames: np.ndarray) -> np.ndarray:
    f = np.ascontiguousarray(frames, np.float32)
    if f.ndim != 2:
        raise ValueError(f"frames must be (sessions, coeffs), got {f.shape}")
    return f


def emit_frames_udp_native(frames: np.ndarray, timestamp: float,
                           sockfd: int, ip: str, port: int
                           ) -> Optional[int]:
    """Send one ``{"timestamp", "session", "blendshapes"}`` JSON datagram
    per session row through an existing unconnected UDP socket fd, entirely
    in C (the Python json.dumps loop measures ~130 us/session — the serving
    host ceiling at high session counts). ``ip`` must be a dotted quad
    (resolve hostnames first). Returns datagrams sent, or None -> caller
    must fall back to the Python loop."""
    lib = native_lib()
    if lib is None or lib.km_emit_frames_udp is None:
        return None
    f = _frames_c(frames)
    sent = lib.km_emit_frames_udp(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f.shape[0], f.shape[1], float(timestamp), sockfd,
        ip.encode("ascii"), int(port))
    return int(sent) if sent >= 0 else None


def format_frames_jsonl_native(frames: np.ndarray, timestamp: float
                               ) -> Optional[bytes]:
    """Format the whole (S, C) frame batch as JSONL (one row per session)
    in C; None -> caller falls back to the Python json.dumps loop."""
    lib = native_lib()
    if lib is None or lib.km_format_frames_jsonl is None:
        return None
    f = _frames_c(frames)
    # must cover km_fmt_row's once-per-row worst-case bound (80 + 34/float)
    cap = f.shape[0] * (96 + 34 * f.shape[1])
    out = ctypes.create_string_buffer(cap)
    n = lib.km_format_frames_jsonl(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        f.shape[0], f.shape[1], float(timestamp), out, cap)
    if n <= 0:
        return None
    return out.raw[:n]
