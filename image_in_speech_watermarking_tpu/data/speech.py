"""Speech data pipeline: waveform -> STFT clips, on device.

Parity targets:
  SpeechDataTrain   uformerWM/audio_test.py:410-516  (n_fft=256 hop=128,
                    drop last freq row, pad time to x128, chunk, optional
                    audio_scale '0.025' or 'min-max' normalization)
  SpeechDataTest    uformerWM/audio_test.py:270-360  (n_fft=255, keeps
                    [raw, clips, tail]),
  speechDataTest129 (256-point variant for exact ISTFT)
  SpeechDataAudio   hidden/audio_test.py:26-150      (time-domain 128^2
                    chunks, scale 0.025)
  normalize_batch   uformerWM/audio_test.py:37-54

TPU-first redesign: the reference eagerly STFTs the whole dataset into
host RAM with a python loop (audio_test.py:439-502). Here chunking is a
traced reshape on device; datasets yield fixed-shape batches; real corpora
(TEDLIUM/LibriSpeech via torchaudio) are gated on local file presence, and
a deterministic synthetic-speech generator keeps everything runnable in a
zero-egress environment.
"""

from __future__ import annotations

import dataclasses
import warnings
from typing import Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu.config import (
    CLIP_FRAMES, EVAL_HOP, EVAL_N_FFT, SAMPLE_RATE, TRAIN_HOP,
    TRAIN_N_FFT)
from image_in_speech_watermarking_tpu.dsp.stft import (
    spec_to_clips, stft_ri)


def synthetic_speech(length: int, seed: int = 0,
                     sr: int = SAMPLE_RATE,
                     peak: float = 0.3) -> np.ndarray:
    """Deterministic speech-like waveform: pitch-modulated harmonic
    excitation through a slowly-varying formant-ish filter + noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(length) / sr
    f0 = 110.0 + 40.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6.28))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = np.zeros(length)
    for h, amp in ((1, 0.5), (2, 0.3), (3, 0.2), (4, 0.1), (6, 0.05)):
        sig += amp * np.sin(h * phase + rng.uniform(0, 6.28))
    env = 0.4 + 0.6 * np.clip(np.sin(2 * np.pi * 2.1 * t
                                     + rng.uniform(0, 6.28)), 0, None)
    sig = sig * env + 0.01 * rng.standard_normal(length)
    # peak-normalize (default 0.3 FS: speech-typical loudness, rms ~0.1;
    # real TEDLIUM/LibriSpeech utterances peak ~0.3-0.9). The level
    # matters: the reference's noise-norm loss term fixes the injected
    # watermark energy in absolute units (audio_uformer_stft.py:463-482),
    # so corpus loudness directly sets the watermark-SNR /
    # attack-robustness operating point. NOTE: the default changed
    # 0.1 -> 0.3 mid round 2 — round-1 / early-round-2 synthetic-corpus
    # checkpoints and metrics sit at a different SNR operating point and
    # are not comparable to later runs (see docs/round2_demo/README.md).
    return (peak * sig / np.abs(sig).max()).astype(np.float32)


def synthetic_speech_hard(length: int, seed: int = 0,
                          sr: int = SAMPLE_RATE) -> np.ndarray:
    """Hardened synthetic regime (round 5, VERDICT r4 next-step #8): a
    segment plan mixing the harmonic voiced generator with the cases the
    smooth default never produces — long near-silences (the embedder
    must hide energy where there is none to mask it), wideband
    fricative noise bursts (flat-spectrum segments defeat
    spectral-valley hiding), hard plosive onsets, and clipping-level
    loud segments next to very quiet ones (extreme dynamics stress the
    fixed-energy watermark's SNR at both ends)."""
    rng = np.random.default_rng(seed)
    out = np.zeros(length, np.float32)
    pos = 0
    kinds = ("voiced", "silence", "fricative", "voiced_loud", "plosive",
             "voiced_quiet")
    while pos < length:
        kind = kinds[int(rng.integers(0, len(kinds)))]
        seg_len = int(rng.uniform(0.3, 1.5) * sr)
        seg_len = min(seg_len, length - pos)
        if kind == "silence":
            seg = (1e-4 * rng.standard_normal(seg_len))
        elif kind == "fricative":
            # high-passed noise (difference filter ~ first-order HP)
            n = rng.standard_normal(seg_len + 1)
            seg = 0.25 * (n[1:] - 0.95 * n[:-1])
        elif kind == "plosive":
            seg = 1e-4 * rng.standard_normal(seg_len)
            burst = min(seg_len, int(0.02 * sr))
            seg[:burst] = 0.9 * rng.standard_normal(burst) \
                * np.exp(-np.arange(burst) / (0.004 * sr))
        else:
            peak = {"voiced": 0.3, "voiced_loud": 0.95,
                    "voiced_quiet": 0.05}[kind]
            seg = synthetic_speech(seg_len,
                                   seed=int(rng.integers(0, 2 ** 31)),
                                   peak=peak)
        # 5 ms cosine cross-fade at the joint to avoid synthetic clicks
        # (real speech has no sample-step discontinuities either). The
        # fade rewinds pos, so it must stay strictly shorter than the
        # segment or the loop stops advancing on a short tail remainder.
        fade = min(int(0.005 * sr), seg_len // 2, pos)
        if fade > 0:
            ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(fade) / fade)
            out[pos - fade:pos] *= 1.0 - ramp
            seg = np.concatenate([seg[:fade] * ramp, seg[fade:]])
            pos -= fade
        out[pos:pos + len(seg)] += seg[:length - pos]
        pos += len(seg)
    peak = np.abs(out).max()
    if peak > 0.98:
        out = 0.98 * out / peak
    return out.astype(np.float32)


def normalize_batch(data: jnp.ndarray, audio_scale: str):
    """The reference's two scaling modes (audio_test.py:37-54,464-479):
    a scalar factor string ('0.025') or a 'min-max' range remap."""
    if audio_scale is None or audio_scale in ("0", "", "False"):
        return data, 0.0, 1.0
    if "-" not in audio_scale:
        return data * float(audio_scale), 0.0, 1.0
    lo_s, hi_s = audio_scale.split("-")
    lo, hi = float(lo_s), float(hi_s)
    dmin, dmax = data.min(), data.max()
    unit = (data - dmin) / (dmax - dmin)
    return unit * (hi - lo) + lo, dmin, dmax


def frequency_masking(spec: np.ndarray, freq_mask_size: int,
                      rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """SpecAugment-style band erase (uformerWM/audio_test.py:26-31): zero a
    random ``freq_mask_size``-bin band along the frequency (first) axis."""
    rng = rng or np.random.default_rng()
    start = int(rng.integers(0, spec.shape[0] - freq_mask_size))
    out = np.array(spec)
    out[start:start + freq_mask_size] = 0
    return out


def wave_to_train_clips(wav: jnp.ndarray) -> jnp.ndarray:
    """Training featurization (audio_test.py:465-502): STFT(256,128,256),
    drop the 129th bin, pad time to x128, chunk -> (n, 128, 128, 2)."""
    spec = stft_ri(wav, TRAIN_N_FFT, TRAIN_HOP, TRAIN_N_FFT)
    clips, _ = spec_to_clips(spec, CLIP_FRAMES, drop_last_bin=True)
    return clips


def wave_to_eval_clips(wav: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """Eval featurization (audio_test.py:307-347): STFT(255) -> 128 bins,
    pad + chunk; also returns the valid frame count of the last clip."""
    spec = stft_ri(wav, EVAL_N_FFT)
    return spec_to_clips(spec, CLIP_FRAMES)


def wave_to_audio_clips(wav: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """hidden/ time-domain featurization (hidden/audio_test.py:98-114):
    scale by 0.025, pad to a multiple of 128^2 samples, reshape each 16384
    chunk to a (128, 128, 1) image."""
    n = CLIP_FRAMES * CLIP_FRAMES
    scaled = wav * 0.025
    tail = scaled.shape[-1] % n
    pad = (n - tail) % n
    padded = jnp.pad(scaled, (0, pad))
    clips = padded.reshape(-1, CLIP_FRAMES, CLIP_FRAMES, 1)
    return clips, (tail if tail else n)


@dataclasses.dataclass
class SpeechDataset:
    """Fixed-shape clip dataset over a list of utterances.

    kind:
      'train'     n_fft 256 features (SpeechDataTrain)
      'train255'  n_fft 255 whole-clip features: same geometry the eval
                  reconstruction chain and the in-graph ISTFT->STFT
                  channel sim use (model.py:2458 ISTFTs n_fft=255), so
                  the training-time round trip is consistent. The
                  reference trains on the 256-geometry and lets the
                  stft_layer conv absorb the mismatch; this mode removes
                  that quirk for production training.
      'train_aug' raw-wave store + random 128-frame STFT crops with an
                  optional transform (SpeechDataTrainAug,
                  uformerWM/audio_test.py:362-409; n_fft=255, no row drop)
      'eval'      n_fft 255 [raw, clips, tail] (SpeechDataTest)
      'eval129'   n_fft 256 keeping the dropped 129th bin row for exact
                  ISTFT round trips (speechDataTest129,
                  uformerWM/audio_test.py:167-258)
      'audio'     time-domain 128^2 chunks (SpeechDataAudio)

    ``transform``: optional callable applied per sampled clip in
    'train_aug' mode, e.g. ``lambda c, rng: frequency_masking(c, 8, rng)``
    (the reference passes torchaudio transforms, audio_test.py:394-397).
    """

    waves: List[np.ndarray]
    kind: str = "train"
    audio_scale: str = "0"
    transform: Optional[callable] = None

    def __post_init__(self):
        # Featurization is host-side prep over per-utterance (ragged)
        # shapes: pin it to the CPU backend — on the remote-TPU platform,
        # eager dispatch would otherwise compile one program per
        # utterance length through the tunnel (minutes for a corpus).
        with jax.default_device(jax.devices("cpu")[0]):
            self._featurize()

    def _featurize(self):
        feats = []
        self.tails: List[int] = []
        self.last_rows: List[np.ndarray] = []
        for w in self.waves:
            if self.kind in ("train", "train255"):
                # trim to a whole-clip sample grid: the featurization
                # program is compiled per distinct length, and training
                # only consumes whole clips anyway — a ragged corpus
                # would otherwise trigger one compile per utterance
                hop = TRAIN_HOP if self.kind == "train" else EVAL_HOP
                q = CLIP_FRAMES * hop
                w = w[: max(len(w) // q * q, q)]
            wj = jnp.asarray(w)
            if self.kind == "train":
                feats.append(np.asarray(wave_to_train_clips(wj)))
            elif self.kind == "train255":
                c, tail = wave_to_eval_clips(wj)
                if int(tail) < CLIP_FRAMES and c.shape[0] > 1:
                    c = c[:-1]           # drop the zero-padded tail clip
                feats.append(np.asarray(c))
            elif self.kind == "train_aug":
                # full unchunked n_fft=255 spec; crops are sampled per
                # batch (audio_test.py:400-406)
                feats.append(np.asarray(stft_ri(wj, EVAL_N_FFT)))
            elif self.kind == "eval":
                c, tail = wave_to_eval_clips(wj)
                feats.append(np.asarray(c))
                self.tails.append(int(tail))
            elif self.kind == "eval129":
                spec = stft_ri(wj, TRAIN_N_FFT, TRAIN_HOP, TRAIN_N_FFT)
                self.last_rows.append(np.asarray(spec[-1]))  # (frames, 2)
                c, tail = spec_to_clips(spec, CLIP_FRAMES, drop_last_bin=True)
                feats.append(np.asarray(c))
                self.tails.append(int(tail))
            elif self.kind == "audio":
                c, tail = wave_to_audio_clips(wj)
                feats.append(np.asarray(c))
                self.tails.append(int(tail))
            else:
                raise ValueError(self.kind)
        if self.kind in ("train", "train255"):
            data = np.concatenate(feats, axis=0)
            scaled, self.data_min, self.data_max = normalize_batch(
                jnp.asarray(data), self.audio_scale)
            self.clips = np.asarray(scaled)
        elif self.kind == "train_aug":
            self.specs = feats
            self.data_min, self.data_max = 0.0, 1.0
        else:
            self.per_utterance = feats
            self.data_min, self.data_max = 0.0, 1.0

    # train-mode API
    def __len__(self):
        if self.kind in ("train", "train255"):
            return len(self.clips)
        if self.kind == "train_aug":
            return len(self.specs)
        return len(self.per_utterance)

    def batches(self, batch_size: int, seed=0,
                drop_last: bool = True) -> Iterator[np.ndarray]:
        """``seed`` may be an int or an entropy tuple like
        ``(run_seed, epoch)`` (anything ``np.random.default_rng``
        accepts)."""
        if self.kind == "train_aug":
            yield from self._aug_batches(batch_size, seed)
            return
        assert self.kind in ("train", "train255")
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(self.clips))
        end = (len(idx) // batch_size) * batch_size if drop_last else len(idx)
        for i in range(0, end, batch_size):
            yield self.clips[idx[i:i + batch_size]]

    def _aug_batches(self, batch_size: int, seed: int = 0):
        """Random-crop sampling (audio_test.py:400-406): one epoch =
        len(specs) samples, each a random utterance-aligned 128-frame crop
        with the optional transform applied."""
        rng = np.random.default_rng(seed)
        n = len(self.specs)
        order = rng.permutation(n)
        for i in range(0, (n // batch_size) * batch_size, batch_size):
            out = []
            for j in order[i:i + batch_size]:
                spec = self.specs[j]
                hi = spec.shape[1] - CLIP_FRAMES - 1
                start = int(rng.integers(0, max(hi, 1)))
                clip = spec[:, start:start + CLIP_FRAMES]
                if clip.shape[1] < CLIP_FRAMES:  # short utterance: pad
                    clip = np.pad(clip, ((0, 0),
                                         (0, CLIP_FRAMES - clip.shape[1]),
                                         (0, 0)))
                if self.transform is not None:
                    clip = self.transform(clip, rng)
                out.append(clip)
            yield np.stack(out)

    # eval-mode API: (raw_wave, clips, tail) triplets like SpeechDataTest;
    # 'eval129' adds the retained 129th-bin row (speechDataTest129 keeps
    # [audio, clips, tail, stft_last_row], audio_test.py:250-252)
    def utterance(self, i: int):
        assert self.kind in ("eval", "eval129", "audio")
        if self.kind == "eval129":
            return (self.waves[i], self.per_utterance[i], self.tails[i],
                    self.last_rows[i])
        return self.waves[i], self.per_utterance[i], self.tails[i]


def load_corpus(dataset: str, size: int, split: str = "train",
                seed: int = 42,
                utt_seconds: float = 8.0,
                offset: int = None) -> List[np.ndarray]:
    """Load `size` utterances. 'tedlium'/'librispeech' use torchaudio if
    the files are on disk (SpeechDataTrain's sources,
    audio_test.py:410-432); 'synthetic' (default fallback) generates
    deterministic speech-like waves.

    For librispeech (a single train-clean-100 pool) non-train splits
    start at utterance index `offset`; callers MUST pass the TRAIN
    corpus size there (not the val size) or validation overlaps
    training data. TEDLIUM maps split 'val' onto its 'dev' subset (a
    disjoint file set, so no offset is needed)."""
    if dataset in ("tedlium", "librispeech"):
        try:
            import torchaudio  # type: ignore

            if dataset == "librispeech":
                ds = torchaudio.datasets.LIBRISPEECH(
                    root="data", url="train-clean-100", download=False)
            else:
                subset = {"val": "dev"}.get(split, split)
                ds = torchaudio.datasets.TEDLIUM(
                    root="data", release="release2", subset=subset,
                    download=False)
        except Exception as e:  # corpus not on disk
            warnings.warn(
                f"{dataset} corpus unavailable ({e!r}); falling back to "
                f"the synthetic corpus for split={split!r}")
        else:
            base = 0
            if dataset == "librispeech" and split != "train":
                base = size if offset is None else offset
            return [np.asarray(ds[base + i][0][0], dtype=np.float32)
                    for i in range(size)]
    base = seed if split == "train" else seed + 10_000
    n = int(utt_seconds * SAMPLE_RATE)
    if dataset == "synthetic_hard":
        return [synthetic_speech_hard(n + 997 * i, seed=base + i)
                for i in range(size)]
    return [synthetic_speech(n + 997 * i, seed=base + i) for i in range(size)]
