"""Host-side attack implementations for eval parity.

The reference runs its whole attack battery on the host
(uformerWM/audio_attack.py), several attacks via file round trips (pydub ->
ffmpeg for aac/mp3, soundfile for requantization). These are inherently
non-differentiable and off-device; this module keeps them available —
gated on their optional dependencies — strictly for *evaluation parity*
against the reference. The training graph always uses the pure-JAX battery
in attacks/waveform.py (SURVEY §7 hard-part 4: real codec parity is
host-side behind an eval-only boundary).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def _ffmpeg_roundtrip(wav: np.ndarray, sr: int, codec_args: list[str],
                      suffix: str) -> np.ndarray:
    """Encode to a lossy codec and decode back via the ffmpeg CLI
    (equivalent to the reference's pydub export/from_file,
    audio_attack.py:140-154, 242-257)."""
    with tempfile.TemporaryDirectory() as d:
        raw_in = os.path.join(d, "in.f32")
        enc = os.path.join(d, "enc" + suffix)
        raw_out = os.path.join(d, "out.f32")
        wav.astype("<f4").tofile(raw_in)
        base = ["ffmpeg", "-hide_banner", "-loglevel", "error", "-y",
                "-f", "f32le", "-ar", str(sr), "-ac", "1", "-i", raw_in]
        subprocess.run(base + codec_args + [enc], check=True)
        subprocess.run(["ffmpeg", "-hide_banner", "-loglevel", "error",
                        "-y", "-i", enc, "-f", "f32le", "-ar", str(sr),
                        "-ac", "1", raw_out], check=True)
        out = np.fromfile(raw_out, dtype="<f4")
    if len(out) >= len(wav):
        return out[: len(wav)]
    return np.pad(out, (0, len(wav) - len(out)))


def aac(wav: np.ndarray, sr: int = 16000, bitrate: str = "128k") -> np.ndarray:
    """Real MPEG-4 AAC round trip (audio_attack.py:140-154)."""
    return _ffmpeg_roundtrip(wav, sr, ["-c:a", "aac", "-b:a", bitrate],
                             ".m4a")


def mp3compress(wav: np.ndarray, sr: int = 16000,
                bitrate: str = "64k") -> np.ndarray:
    """Real MP3 round trip (audio_attack.py:242-257)."""
    return _ffmpeg_roundtrip(wav, sr,
                             ["-c:a", "libmp3lame", "-b:a", bitrate], ".mp3")


def requantization(wav: np.ndarray, bits: int = 8) -> np.ndarray:
    """PCM_U8 write+read equivalent without the file round trip
    (audio_attack.py:87-96)."""
    scale = float(2 ** (bits - 1))
    q = np.clip(np.round(np.clip(wav, -1.0, (scale - 1) / scale) * scale),
                -scale, scale - 1)
    return q / scale


HOST_ATTACKS = {
    "aac": aac,
    "mp3compress": mp3compress,
    "requantization": requantization,
}
