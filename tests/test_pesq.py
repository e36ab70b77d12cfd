"""Vendored PESQ (eval/pesq.py): calibration properties of the numpy
P.862 implementation that replaces pypesq (evaluate.py:152-156)."""

import numpy as np
import pytest

from image_in_speech_watermarking_tpu.data.speech import synthetic_speech
from image_in_speech_watermarking_tpu.eval import metrics
from image_in_speech_watermarking_tpu.eval.pesq import pesq_numpy


@pytest.fixture(scope="module")
def ref():
    return synthetic_speech(16000 * 4, seed=3)


def test_identical_is_max(ref):
    assert pesq_numpy(ref, ref) == pytest.approx(4.5)


def test_monotonic_in_awgn_snr(ref):
    rng = np.random.default_rng(0)
    scores = []
    for snr in (30, 20, 10, 0):
        npow = np.mean(ref ** 2) / 10 ** (snr / 10)
        deg = ref + rng.standard_normal(len(ref)) * np.sqrt(npow)
        scores.append(pesq_numpy(ref, deg))
    assert scores == sorted(scores, reverse=True)
    # published P.862 operating points on clean speech + AWGN
    assert 3.4 < scores[1] < 4.2   # 20 dB
    assert 2.3 < scores[2] < 3.3   # 10 dB
    assert 1.0 < scores[3] < 2.2   # 0 dB


def test_bounded(ref):
    rng = np.random.default_rng(1)
    noise = rng.standard_normal(len(ref)).astype(np.float32)
    assert -0.5 <= pesq_numpy(ref, noise) <= 4.5


def test_invariances(ref):
    # level alignment: pure gain is transparent
    assert pesq_numpy(ref, ref * 0.5) == pytest.approx(4.5, abs=0.05)
    # delay compensation: a 100-sample shift is transparent
    shifted = np.concatenate([np.zeros(100, np.float32), ref])
    assert pesq_numpy(ref, shifted) == pytest.approx(4.5, abs=0.05)


def test_cal_pesq_never_nan(ref):
    """The metrics wrapper falls back to the vendored implementation, so
    results.csv's PESQ column is populated in this image."""
    val = metrics.cal_pesq(ref, ref)
    assert val is not None and val == pytest.approx(4.5, abs=0.01)


def test_too_short_raises():
    with pytest.raises(ValueError):
        pesq_numpy(np.zeros(100), np.zeros(100))


def test_awgn_operating_points_match_published_curves(ref):
    """docs/PESQ_VALIDATION.md: the AWGN curve sits inside the spread of
    published speech+white-noise raw-PESQ curves (loose +/-0.5 bars)."""
    rng = np.random.default_rng(7)
    expected = {30: (3.8, 4.5), 20: (3.2, 4.2), 10: (2.3, 3.2),
                5: (1.7, 2.6)}
    p = np.mean(ref ** 2)
    for snr, (lo, hi) in expected.items():
        noise = rng.standard_normal(len(ref)) * np.sqrt(p / 10 ** (snr / 10))
        score = pesq_numpy(ref, ref + noise)
        assert lo <= score <= hi, (snr, score)
