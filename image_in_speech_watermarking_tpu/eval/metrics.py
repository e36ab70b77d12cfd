"""Evaluation metrics.

Parity targets:
  signaltonoise  20*log10|mean/std| (uformerWM/audio_test.py:521-526,
                 evaluate.py:134-139 — the deprecated scipy formula)
  cal_snr        10*log10(sum s^2 / sum (s-s')^2) (evaluate.py:141-146)
  cal_pesq       pypesq (evaluate.py:152-156; gated — pypesq is optional)
  bitwise error  mean |round(clip(dec,0,1)) - msg| (hidden/test_model.py:60-64)
  MSE            torch.nn.MSELoss equivalents throughout
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np


def mse(a, b) -> float:
    a, b = np.asarray(a), np.asarray(b)
    return float(np.mean((a - b) ** 2))


def signaltonoise(a, axis=0, ddof=0) -> np.ndarray:
    """The legacy scipy.stats.signaltonoise formula used by the
    reference."""
    a = np.asanyarray(a)
    m = a.mean(axis)
    sd = a.std(axis=axis, ddof=ddof)
    return 20 * np.log10(np.abs(np.where(sd == 0, 0, m / sd)))


def cal_snr(audio_ori, audio_recon) -> float:
    """Power-ratio SNR over the common prefix (evaluate.py:141-146)."""
    a = np.asarray(audio_ori).reshape(-1)
    b = np.asarray(audio_recon).reshape(-1)
    n = min(len(a), len(b))
    ps = np.sum(a[:n] ** 2)
    pn = np.sum((a[:n] - b[:n]) ** 2)
    return float(10 * np.log10(ps / pn)) if pn > 0 else float("inf")


def bitwise_error(decoded, message) -> float:
    """HiDDeN decoder bitwise error (hidden/test_model.py:60-64)."""
    d = np.clip(np.round(np.asarray(decoded)), 0, 1)
    m = np.asarray(message)
    return float(np.mean(np.abs(d - m)))


def cal_pesq(audio_ori, audio_recon, sr: int = 16000) -> Optional[float]:
    """PESQ (evaluate.py:152-156): pypesq/pesq when installed, else the
    vendored numpy P.862 implementation (eval/pesq.py) — the column is
    never NaN."""
    a = np.asarray(audio_ori).reshape(-1)
    b = np.asarray(audio_recon).reshape(-1)
    n = min(len(a), len(b))
    try:
        from pypesq import pesq  # type: ignore

        return float(pesq(a[:n], b[:n], sr))
    except Exception:
        pass
    try:
        from pesq import pesq  # type: ignore

        return float(pesq(sr, a[:n], b[:n], "wb"))
    except Exception:
        pass
    from image_in_speech_watermarking_tpu.eval.pesq import pesq_numpy

    try:
        return pesq_numpy(a[:n], b[:n], sr)
    except ValueError:  # too short
        return None
