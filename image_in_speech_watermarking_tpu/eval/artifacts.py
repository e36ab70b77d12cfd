"""Eval / training visual artifacts.

Parity targets — the reference's primary human verification channel:
  evaluate.py:239-282      per-utterance wav + soundwave/STFT/specgram
                           pngs + watermark image saves
  audio_test.py:787-806    show_watermark grids (original / decoded
                           before attack / decoded after attack)
  audio_uformer_stft.py:486-536  training-time message-vs-decoded figure
                           grids every N steps

All figures use the matplotlib Agg backend (headless) and 16 kHz PCM16
wavs via scipy (soundfile is absent in this image).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from image_in_speech_watermarking_tpu.config import SAMPLE_RATE


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def save_wav(path: str, wave: np.ndarray, sr: int = SAMPLE_RATE) -> str:
    """float waveform -> 16-bit PCM wav (evaluate.py saves attacked +
    reconstructed audio per utterance)."""
    from scipy.io import wavfile

    x = np.asarray(wave, np.float32).reshape(-1)
    peak = max(np.abs(x).max(), 1e-9)
    scale = 0.99 / peak if peak > 0.99 else 1.0
    wavfile.write(path, sr, (x * scale * 32767).astype(np.int16))
    return path


def soundwave_visualize(orig: np.ndarray, processed: np.ndarray,
                        path: str) -> str:
    """Two-panel waveform comparison (evaluate.py soundwave_visualize)."""
    plt = _plt()
    fig, axes = plt.subplots(2, 1, figsize=(10, 4), sharex=True)
    for ax, (sig, title) in zip(axes, ((orig, "original"),
                                       (processed, "processed"))):
        sig = np.asarray(sig).reshape(-1)
        ax.plot(np.arange(len(sig)) / SAMPLE_RATE, sig, linewidth=0.3)
        ax.set_title(title, fontsize=9)
    axes[1].set_xlabel("seconds")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def stft_visualize(wave: np.ndarray, path: str, n_fft: int = 255) -> str:
    """Log-magnitude STFT heatmap (evaluate.py stft_visualize)."""
    from image_in_speech_watermarking_tpu.dsp.stft import stft_ri

    plt = _plt()
    spec = np.asarray(stft_ri(np.asarray(wave, np.float32), n_fft))
    mag = np.log10(np.sqrt((spec ** 2).sum(-1)) + 1e-8)
    fig, ax = plt.subplots(figsize=(10, 3))
    ax.imshow(mag, origin="lower", aspect="auto", cmap="magma")
    ax.set_xlabel("frame")
    ax.set_ylabel("bin")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def specgram_visualize(wave: np.ndarray, path: str) -> str:
    """matplotlib specgram (audio_attack.py's specgram viz)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 3))
    ax.specgram(np.asarray(wave).reshape(-1), Fs=SAMPLE_RATE)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def watermark_grid(images, path: str, titles=None,
                   ncols: Optional[int] = None) -> str:
    """Row of watermark images in [0,1] (show_watermark,
    audio_test.py:787-806)."""
    plt = _plt()
    images = [np.asarray(im).reshape(32, 32) for im in images]
    n = len(images)
    ncols = ncols or n
    nrows = -(-n // ncols)
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=(1.6 * ncols, 1.8 * nrows),
                             squeeze=False)
    for k in range(nrows * ncols):
        ax = axes[k // ncols][k % ncols]
        ax.axis("off")
        if k < n:
            ax.imshow(images[k], cmap="gray", vmin=0, vmax=1)
            if titles and k < len(titles):
                ax.set_title(titles[k], fontsize=7)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def save_eval_artifacts(outdir: str, tag: str, wave, result, message) -> list:
    """The reference's per-utterance artifact set (evaluate.py:239-282):
    wavs, waveform/STFT/specgram figures, and the original / no-attack /
    after-attack watermark grid. ``result`` is an eval UtteranceResult."""
    os.makedirs(outdir, exist_ok=True)
    p = lambda name: os.path.join(outdir, f"{tag}_{name}")  # noqa: E731
    written = [
        save_wav(p("recon.wav"), result.recon_audio),
        save_wav(p("attacked.wav"), result.att_audio),
        soundwave_visualize(wave, result.att_audio, p("soundwave.png")),
        stft_visualize(result.recon_audio, p("stft.png")),
        specgram_visualize(result.att_audio, p("specgram.png")),
        watermark_grid(
            [np.asarray(message).reshape(32, 32),
             result.wm_decoded.mean(axis=0),
             result.wm_decoded_att.mean(axis=0)],
            p("watermark.png"),
            titles=["message", "decoded", "decoded after attack"]),
    ]
    return written


def save_training_figure(path: str, message, wm_pred, wm_decode,
                         max_items: int = 8) -> str:
    """Training-time grid: message / wm_pred / wm_decode rows
    (audio_uformer_stft.py:486-536)."""
    plt = _plt()
    m = np.asarray(message)[:max_items, ..., 0]
    p_ = np.asarray(wm_pred)[:max_items, ..., 0]
    d = np.asarray(wm_decode)[:max_items, ..., 0]
    n = m.shape[0]
    fig, axes = plt.subplots(3, n, figsize=(1.4 * n, 4.4), squeeze=False)
    for j in range(n):
        for i, (row, label) in enumerate(((m, "msg"), (p_, "pred"),
                                          (d, "decode"))):
            ax = axes[i][j]
            ax.imshow(row[j], cmap="gray", vmin=0, vmax=1)
            ax.axis("off")
            if j == 0:
                ax.set_title(label, fontsize=7, loc="left")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
