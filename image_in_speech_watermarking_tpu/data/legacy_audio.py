"""Legacy audio->STFT collate helpers and watermark-product datasets.

Parity target: uformerWM/data_audio.py:19-257 — ``align_audio_len`` (pad a
batch to the max length), ``sw_to_stft`` collate (batch STFT with n_fft
1023 or 255), ``get_mark_img`` (img16/ digit images), ``gen_watermarking``
(random 0/1 or +-1 marks), ``AudioMark`` / ``AudioMarkAll`` (utterance x
watermark product datasets). numpy seed 420 (data_audio.py:16).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu.dsp.stft import stft_ri

_rng = np.random.default_rng(420)  # data_audio.py:16


def align_audio_len(waves: Sequence[np.ndarray]) -> np.ndarray:
    """Zero-pad a list of 1-D waveforms to the batch max
    (pad_sequence equivalent, data_audio.py:19-30)."""
    max_len = max(len(w) for w in waves)
    out = np.zeros((len(waves), max_len), dtype=np.float32)
    for i, w in enumerate(waves):
        out[i, : len(w)] = w
    return out


def sw_to_stft(waves: Sequence[np.ndarray], n_fft: int = 255) -> jnp.ndarray:
    """Batch STFT collate (data_audio.py:33-56): pad-align then
    torch.stft(n_fft) -> (B, bins, frames, 2)."""
    batch = jnp.asarray(align_audio_len(waves))
    return stft_ri(batch, n_fft=n_fft)


def gen_watermarking(size: int = 32, kind: str = "binary",
                     seed: int | None = None) -> np.ndarray:
    """Random watermark mark (data_audio.py:105-127): 'binary' 0/1 or
    'sign' +-1."""
    rng = np.random.default_rng(seed) if seed is not None else _rng
    bits = rng.integers(0, 2, size=(size, size, 1)).astype(np.float32)
    if kind == "sign":
        return bits * 2.0 - 1.0
    return bits


class AudioMark:
    """Utterance x watermark product dataset (data_audio.py:130-180):
    index i maps to (audio[i % n_audio], mark[i // n_audio])."""

    def __init__(self, waves: Sequence[np.ndarray],
                 marks: Sequence[np.ndarray]):
        self.waves = list(waves)
        self.marks = list(marks)

    def __len__(self):
        return len(self.waves) * len(self.marks)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return (self.waves[i % len(self.waves)],
                self.marks[i // len(self.waves)])


class AudioMarkAll(AudioMark):
    """Every (utterance, mark) pair, mark-major (data_audio.py:183-215)."""

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        return (self.waves[i // len(self.marks)],
                self.marks[i % len(self.marks)])
