"""Serving API: embed / extract watermarks in arbitrary-length audio.

Production interface over the framework (no reference counterpart — the
reference only exposes research drivers): one jitted program per
(clip-bucket) signature, clip counts padded to power-of-two buckets so
the compile cache stays bounded for unbounded-length audio.

    wmk = Watermarker.from_checkpoint("results/<run>/model")
    marked = wmk.embed(wave, message)      # (L,) float32 @ 16 kHz
    wm     = wmk.extract(marked)           # (32, 32) in [0, 1]
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import models
from image_in_speech_watermarking_tpu.config import CLIP_FRAMES, EVAL_N_FFT
from image_in_speech_watermarking_tpu.dsp.stft import (istft_ri,
                                                       spec_to_clips,
                                                       stft_ri)


def _bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class Watermarker:
    """Stateless-per-call embed/extract around a trained spectrogram
    watermarker (UformerAudio or any model with embed-like/decode
    methods)."""

    def __init__(self, model, variables, model_name: str = "uformer",
                 audio_scale: str = "0", data_min: float = 0.0,
                 data_max: float = 1.0):
        self.model = model
        # pin weights on device once — host-resident (e.g. orbax-restored
        # numpy) params would otherwise re-upload every call
        self.variables = jax.device_put(variables)
        self.model_name = model_name
        self.audio_scale = audio_scale
        self.data_min = float(data_min)
        self.data_max = float(data_max)
        self._embed_fn = None
        self._extract_fn = None

    @classmethod
    def from_checkpoint(cls, path: str, arch: str = "Uformer_audio",
                        compute_dtype: str = "float32",
                        **kw) -> "Watermarker":
        from image_in_speech_watermarking_tpu.train import checkpoint

        restored = checkpoint.restore(path)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            variables["batch_stats"] = restored["batch_stats"]
        if arch == "Uformer_audio":
            model = models.get_arch(arch, compute_dtype=compute_dtype)
        else:
            model = models.get_arch(arch)
        name = "modelA" if arch == "ModelA" else "uformer"
        return cls(model, variables, model_name=name, **kw)

    # ---------------- internals ----------------

    def _scale(self, clips):
        s = self.audio_scale
        if s in (None, "0", "", "False"):
            return clips
        if "-" not in s:
            return clips * float(s)
        lo, hi = (float(v) for v in s.split("-"))
        unit = (clips - self.data_min) / (self.data_max - self.data_min)
        return unit * (hi - lo) + lo

    def _unscale(self, clips):
        s = self.audio_scale
        if s in (None, "0", "", "False"):
            return clips
        if "-" not in s:
            return clips / float(s)
        lo, hi = (float(v) for v in s.split("-"))
        unit = (clips - lo) / (hi - lo)
        return unit * (self.data_max - self.data_min) + self.data_min

    def _build(self):
        """One jitted program per wave-length bucket: featurize (STFT +
        chunk), model, overlap-add reconstruction all fused — eager
        per-op dispatch is pathological through a remote-accelerator
        tunnel."""
        model, name = self.model, self.model_name

        def embed_fn(variables, wave, message):
            spec = stft_ri(wave, EVAL_N_FFT)
            clips, _ = spec_to_clips(spec, CLIP_FRAMES)
            scaled = self._scale(clips)
            b = clips.shape[0]
            msg = jnp.broadcast_to(message, (b,) + message.shape[-3:])
            if name == "modelA":
                marked, _ = model.apply(variables, scaled, msg)
            else:
                # embed-only path: skips channel sim + extractor entirely
                marked, _, _ = model.apply(variables, scaled, msg,
                                           method="embed")
            marked = self._unscale(marked)
            n, bins, f, _ = marked.shape
            out_spec = marked.transpose(1, 0, 2, 3).reshape(bins, n * f, 2)
            out_spec = out_spec[:, : spec.shape[1]]
            return istft_ri(out_spec, n_fft=EVAL_N_FFT,
                            length=wave.shape[-1])

        def extract_fn(variables, wave):
            spec = stft_ri(wave, EVAL_N_FFT)
            clips, _ = spec_to_clips(spec, CLIP_FRAMES)
            scaled = self._scale(clips)
            method = "decode" if name == "modelA" else "wm_decode"
            return model.apply(variables, scaled, method=method)

        self._embed_fn = jax.jit(embed_fn)
        self._extract_fn = jax.jit(extract_fn)

    def _pad_wave(self, wave) -> tuple[jnp.ndarray, int]:
        x = np.asarray(wave, np.float32).reshape(-1)
        n = len(x)
        padded = _bucket(max(n, 16000))
        if padded != n:
            x = np.pad(x, (0, padded - n))
        return jnp.asarray(x), n

    # ---------------- public API ----------------

    def embed(self, wave, message) -> np.ndarray:
        """Watermark a waveform. message: (32, 32) or (1, 32, 32, 1) in
        [0, 1]. Returns a float32 waveform of the same length."""
        if self._embed_fn is None:
            self._build()
        wave_j, n = self._pad_wave(wave)
        msg = jnp.asarray(np.asarray(message, np.float32).reshape(
            1, 32, 32, 1))
        out = self._embed_fn(self.variables, wave_j, msg)
        return np.asarray(out)[:n]

    def extract(self, wave, per_clip: bool = False) -> np.ndarray:
        """Recover the watermark image; averages clip-level decodes unless
        ``per_clip``."""
        if self._extract_fn is None:
            self._build()
        wave_j, n = self._pad_wave(wave)
        wm = np.asarray(self._extract_fn(self.variables, wave_j)[:, :, :, 0])
        return wm if per_clip else wm.mean(axis=0)
