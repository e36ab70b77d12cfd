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
        checkpoint.check_model_cfg(path, getattr(model, 'cfg', None))
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


class StreamingWatermarker:
    """Exact streaming embed over unbounded audio.

    ``push(samples)`` returns watermarked samples as they become final;
    ``flush()`` returns the rest. The concatenation equals
    ``Watermarker.embed(whole_wave, message)`` sample-for-sample: the
    device runs ONE fixed-shape jitted program per chunk (K clips of
    STFT frames), and the host carries the raw overlap-add numerator /
    window-envelope tails across chunks, normalizing only once both
    sides of every seam have accumulated (so chunking is invisible to
    the output). Stream edges use the same reflect padding as the
    whole-signal path; the final partial chunk is zero-padded with a
    frame mask excluding pad frames from OLA (dsp.istft_ri semantics).

    Memory and compile cache are O(chunk), independent of stream length
    — the production answer to hour-long audio that the bucketed
    ``Watermarker`` (one program per power-of-two length) cannot bound.
    """

    def __init__(self, wmk: Watermarker, message,
                 clips_per_chunk: int = 2, n_fft: int = EVAL_N_FFT):
        from image_in_speech_watermarking_tpu.dsp.stft import _as_pair

        self.w = wmk
        self.n_fft = n_fft
        self.hop, _ = _as_pair(n_fft, None, None)
        self.frames = clips_per_chunk * CLIP_FRAMES
        self.chunk_in = (self.frames - 1) * self.hop + n_fft
        self.advance = self.frames * self.hop
        self.message = jnp.asarray(
            np.asarray(message, np.float32).reshape(1, 32, 32, 1))
        self._buf = np.zeros((0,), np.float32)   # padded-coordinate samples
        self._first = True
        self._sig_tail = np.zeros(n_fft - self.hop, np.float32)
        self._env_tail = np.zeros(n_fft - self.hop, np.float32)
        self._skip = n_fft // 2      # left center-trim of the output
        self._in_len = 0             # stream samples pushed
        self._out_len = 0            # stream samples emitted
        self._frames_done = 0        # STFT frames consumed by chunks
        self._fn = None

    def _build(self):
        from image_in_speech_watermarking_tpu.dsp.stft import (
            _dft_bases, _dftmm, _idft_bases, _ola, _padded_window,
            frame_signal)

        model, name = self.w.model, self.w.model_name
        n_fft, hop, nframes = self.n_fft, self.hop, self.frames
        w_np = _padded_window(None, n_fft, n_fft)

        def fn(variables, chunk, message, frame_mask):
            frames = frame_signal(chunk, n_fft, hop, center=False)
            wj = jnp.asarray(w_np, chunk.dtype)
            cos_b, msin_b = _dft_bases(n_fft)
            fw = frames * wj
            spec = jnp.stack([_dftmm(fw, cos_b), _dftmm(fw, msin_b)],
                             axis=-1)                    # (F, bins, 2)
            # zero pad-frames BEFORE the model: the whole-signal path
            # chunks a zero-padded spec (spec_to_clips), and the model
            # mixes frames within a clip, so the pad content matters
            spec = spec * frame_mask.astype(spec.dtype)[:, None, None]
            bins = spec.shape[-2]
            clips = spec.reshape(nframes // CLIP_FRAMES, CLIP_FRAMES,
                                 bins, 2).transpose(0, 2, 1, 3)
            scaled = self.w._scale(clips)
            k = clips.shape[0]
            msg = jnp.broadcast_to(message, (k,) + message.shape[-3:])
            if name == "modelA":
                marked, _ = model.apply(variables, scaled, msg)
            else:
                marked, _, _ = model.apply(variables, scaled, msg,
                                           method="embed")
            marked = self.w._unscale(marked)
            out = marked.transpose(0, 2, 1, 3).reshape(nframes, bins, 2)
            icos, misin = _idft_bases(n_fft)
            tframes = _dftmm(out[..., 0], icos) + _dftmm(out[..., 1], misin)
            m = frame_mask.astype(tframes.dtype)
            out_len = (nframes - 1) * hop + n_fft
            sig = _ola(tframes * wj * m[:, None], hop, out_len)
            env = _ola(jnp.broadcast_to(wj * wj, (nframes, n_fft))
                       * m[:, None], hop, out_len)
            return sig, env

        self._fn = jax.jit(fn)

    def _run_chunk(self, chunk: np.ndarray, mask: np.ndarray,
                   emit: int) -> np.ndarray:
        if self._fn is None:
            self._build()
        sig, env = self._fn(self.w.variables, jnp.asarray(chunk),
                            self.message, jnp.asarray(mask))
        sig, env = np.array(sig), np.array(env)
        t = len(self._sig_tail)
        sig[:t] += self._sig_tail
        env[:t] += self._env_tail
        self._sig_tail = sig[self.advance:].copy()
        self._env_tail = env[self.advance:].copy()
        self._frames_done += self.frames
        out = sig[:emit] / np.where(env[:emit] > 1e-11, env[:emit], 1.0)
        if self._skip:
            cut = min(self._skip, len(out))
            out = out[cut:]
            self._skip -= cut
        return out.astype(np.float32)

    def push(self, samples) -> np.ndarray:
        """Feed samples; returns finalized watermarked samples (possibly
        empty)."""
        x = np.asarray(samples, np.float32).reshape(-1)
        self._in_len += len(x)
        if self._first and len(self._buf) + len(x) > self.n_fft // 2:
            whole = np.concatenate([self._buf, x])
            left = whole[1:self.n_fft // 2 + 1][::-1]   # reflect pad
            self._buf = np.concatenate([left, whole])
            self._first = False
        else:
            self._buf = np.concatenate([self._buf, x])
        if self._first:
            return np.zeros((0,), np.float32)
        outs = []
        ones = np.ones(self.frames, np.float32)
        while len(self._buf) >= self.chunk_in:
            outs.append(self._run_chunk(self._buf[:self.chunk_in], ones,
                                        self.advance))
            self._buf = self._buf[self.advance:]
        out = np.concatenate(outs) if outs else np.zeros((0,), np.float32)
        self._out_len += len(out)
        return out

    def flush(self) -> np.ndarray:
        """Right-pad (reflect, matching the whole-signal STFT), process
        the final partial chunk(s) with pad frames masked out, and emit
        exactly the remaining ``len(stream) - emitted`` samples."""
        if self._first:   # tiny stream: apply left reflect now
            if len(self._buf) == 0:
                return np.zeros((0,), np.float32)
            left = self._buf[1:self.n_fft // 2 + 1][::-1]
            self._buf = np.concatenate([left, self._buf])
            self._first = False
        right_src = self._buf[-(self.n_fft // 2 + 1):-1]
        self._buf = np.concatenate([self._buf, right_src[::-1]])
        # total frames the whole-signal STFT would produce
        padded_len = self._in_len + 2 * (self.n_fft // 2)
        total_frames = 1 + (padded_len - self.n_fft) // self.hop
        outs = []
        target = self._in_len - self._out_len
        while sum(len(o) for o in outs) < target:
            n_valid = min(max(total_frames - self._frames_done, 0),
                          self.frames)
            chunk = self._buf[:self.chunk_in]
            if len(chunk) < self.chunk_in:
                chunk = np.pad(chunk, (0, self.chunk_in - len(chunk)))
            mask = np.zeros(self.frames, np.float32)
            mask[:n_valid] = 1.0
            outs.append(self._run_chunk(chunk, mask, self.advance))
            self._buf = self._buf[self.advance:]
        out = np.concatenate(outs)[:target]
        self._out_len += len(out)
        return out.astype(np.float32)
