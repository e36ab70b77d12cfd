"""ctypes bindings for the native audio runtime (runtime/audioio.cpp).

Provides fast host-side WAV I/O, PCM requantization and framing. The
library is built on demand with g++ (the environment's native toolchain);
all entry points fall back to numpy when unavailable, so the framework
never hard-depends on the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "libaudioio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


class _WavInfo(ctypes.Structure):
    _fields_ = [("sample_rate", ctypes.c_int32),
                ("channels", ctypes.c_int32),
                ("bits", ctypes.c_int32),
                ("frames", ctypes.c_int64)]


def _build() -> bool:
    src = os.path.join(_RUNTIME_DIR, "audioio.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o",
             _LIB_PATH, src], check=True, capture_output=True)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]
    lib.wav_info.restype = ctypes.c_int
    lib.wav_read.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64]
    lib.wav_read.restype = ctypes.c_int64
    lib.wav_write.argtypes = [ctypes.c_char_p, f32p, ctypes.c_int64,
                              ctypes.c_int32, ctypes.c_int32]
    lib.wav_write.restype = ctypes.c_int
    lib.pcm_requantize.argtypes = [f32p, f32p, ctypes.c_int64,
                                   ctypes.c_int32]
    lib.pcm_requantize.restype = None
    lib.frame_signal.argtypes = [f32p, ctypes.c_int64, f32p,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int64]
    lib.frame_signal.restype = ctypes.c_int64
    _lib = lib
    return _lib


def have_native() -> bool:
    return get_lib() is not None


def wav_read(path: str) -> Tuple[np.ndarray, int]:
    """Read a WAV file to mono float32 [-1, 1). Native fast path with a
    numpy fallback for float32/PCM16/PCM_U8 RIFF files."""
    lib = get_lib()
    if lib is not None:
        info = _WavInfo()
        if lib.wav_info(path.encode(), ctypes.byref(info)) == 0:
            out = np.empty(info.frames, dtype=np.float32)
            n = lib.wav_read(path.encode(), out, info.frames)
            if n >= 0:
                return out[:n], int(info.sample_rate)
    return _wav_read_numpy(path)


def wav_write(path: str, x: np.ndarray, sample_rate: int = 16000,
              bits: int = 16) -> None:
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float32).reshape(-1))
    lib = get_lib()
    if lib is not None:
        if lib.wav_write(path.encode(), x, len(x), sample_rate, bits) == 0:
            return
    _wav_write_numpy(path, x, sample_rate, bits)


def pcm_requantize(x: np.ndarray, bits: int = 8) -> np.ndarray:
    """Requantization attack host path (audio_attack.py:87-96 without the
    file round trip)."""
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float32).reshape(-1))
    lib = get_lib()
    if lib is not None:
        out = np.empty_like(x)
        lib.pcm_requantize(x, out, len(x), bits)
        return out
    scale = float(2 ** (bits - 1))
    return np.round(np.clip(x, -1, (scale - 1) / scale) * scale) / scale


def frame_signal(x: np.ndarray, frame_len: int, hop: int,
                 pad: int = 0) -> np.ndarray:
    """Host-side framing with reflect padding (native when available)."""
    x = np.ascontiguousarray(np.asarray(x, dtype=np.float32).reshape(-1))
    total = len(x) + 2 * pad
    num = 0 if total < frame_len else 1 + (total - frame_len) // hop
    lib = get_lib()
    if lib is not None:
        out = np.empty((num, frame_len), dtype=np.float32)
        n = lib.frame_signal(x, len(x), out, frame_len, hop, pad)
        return out[:n]
    xp = np.pad(x, pad, mode="reflect") if pad else x
    idx = np.arange(num)[:, None] * hop + np.arange(frame_len)[None, :]
    return xp[idx]


# ------------------------- numpy fallbacks -------------------------

def _wav_read_numpy(path: str) -> Tuple[np.ndarray, int]:
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128) / 128
    elif width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768
    else:
        x = np.frombuffer(raw, np.float32)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def _wav_write_numpy(path: str, x: np.ndarray, sr: int, bits: int) -> None:
    import wave

    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setframerate(sr)
        if bits == 8:
            w.setsampwidth(1)
            q = np.clip(np.rint(np.clip(x, -1, 127 / 128) * 128) + 128,
                        0, 255).astype(np.uint8)
        else:
            w.setsampwidth(2)
            q = np.clip(np.rint(np.clip(x, -1, 1) * 32768), -32768,
                        32767).astype(np.int16)
        w.writeframes(q.tobytes())
