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
        self.variables = variables
        self.model_name = model_name
        self.audio_scale = audio_scale
        self.data_min = float(data_min)
        self.data_max = float(data_max)
        self._embed_fn = None
        self._extract_fn = None

    @classmethod
    def from_checkpoint(cls, path: str, arch: str = "Uformer_audio",
                        **kw) -> "Watermarker":
        from image_in_speech_watermarking_tpu.train import checkpoint

        restored = checkpoint.restore(path)
        variables = {"params": restored["params"]}
        if restored.get("batch_stats") is not None:
            variables["batch_stats"] = restored["batch_stats"]
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
        model, name = self.model, self.model_name

        def embed_fn(variables, clips, message):
            scaled = self._scale(clips)
            b = clips.shape[0]
            msg = jnp.broadcast_to(message, (b,) + message.shape[-3:])
            if name == "modelA":
                marked, _ = model.apply(variables, scaled, msg)
            else:
                # embed-only path: skips channel sim + extractor entirely
                marked, _, _ = model.apply(variables, scaled, msg,
                                           method="embed")
            return self._unscale(marked)

        def extract_fn(variables, clips):
            scaled = self._scale(clips)
            method = "decode" if name == "modelA" else "wm_decode"
            return model.apply(variables, scaled, method=method)

        self._embed_fn = jax.jit(embed_fn)
        self._extract_fn = jax.jit(extract_fn)

    def _embed_clips(self, clips, message):
        if self._embed_fn is None:
            self._build()
        return self._embed_fn(self.variables, clips, message)

    def _extract_clips(self, clips):
        if self._extract_fn is None:
            self._build()
        return self._extract_fn(self.variables, clips)

    def _featurize(self, wave: np.ndarray):
        wave_j = jnp.asarray(np.asarray(wave, np.float32).reshape(-1))
        spec = stft_ri(wave_j, EVAL_N_FFT)
        clips, valid = spec_to_clips(spec, CLIP_FRAMES)
        n = clips.shape[0]
        pad = _bucket(n) - n
        if pad:
            clips = jnp.concatenate(
                [clips, jnp.zeros((pad,) + clips.shape[1:], clips.dtype)])
        return wave_j, clips, n, valid

    # ---------------- public API ----------------

    def embed(self, wave, message) -> np.ndarray:
        """Watermark a waveform. message: (32, 32) or (1, 32, 32, 1) in
        [0, 1]. Returns a float32 waveform of the same length."""
        wave_j, clips, n, valid = self._featurize(wave)
        msg = jnp.asarray(np.asarray(message, np.float32).reshape(
            1, 32, 32, 1))
        marked = self._embed_clips(clips, msg)[:n]
        bins, f = marked.shape[1], marked.shape[2]
        spec = marked.transpose(1, 0, 2, 3).reshape(bins, n * f, 2)
        spec = spec[:, : (n - 1) * f + valid]
        out = istft_ri(spec, n_fft=EVAL_N_FFT, length=wave_j.shape[-1])
        return np.asarray(out)

    def extract(self, wave, per_clip: bool = False) -> np.ndarray:
        """Recover the watermark image; averages clip-level decodes unless
        ``per_clip``."""
        _, clips, n, _ = self._featurize(wave)
        wm = np.asarray(self._extract_clips(clips)[:n, :, :, 0])
        return wm if per_clip else wm.mean(axis=0)
