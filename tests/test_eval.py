"""Evaluation pipeline tests: reconstruct->attack->extract chain, metric
formulas, result line format + CSV extraction parity."""

import os

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.eval import (
    evaluate_model, metrics, process_data_to_csv, reconstruct_audio)


@pytest.fixture(scope="module")
def model_a():
    model = models.ModelA()
    import jax.numpy as jnp
    stft = jnp.zeros((1, 128, 128, 2))
    wm = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.key(0), stft, wm)
    return model, variables


@pytest.fixture(scope="module")
def eval_ds():
    waves = data.load_corpus("synthetic", 2, split="test", utt_seconds=3.0)
    return data.SpeechDataset(waves, kind="eval")


def test_metric_formulas():
    x = np.sin(np.linspace(0, 40, 16000))
    noisy = x + 0.01 * np.random.default_rng(0).standard_normal(16000)
    snr = metrics.cal_snr(x, noisy)
    assert 30 < snr < 44  # power ratio ~ (0.7/0.01)^2
    assert metrics.cal_snr(x, x) == float("inf")
    assert metrics.mse(x, x) == 0.0
    msg = np.random.default_rng(1).integers(0, 2, (4, 32, 32, 1))
    assert metrics.bitwise_error(msg, msg) == 0.0
    assert metrics.bitwise_error(1 - msg, msg) == 1.0
    s = metrics.signaltonoise(np.full(100, 3.0) + 1e-9)
    assert s > 100  # near-constant signal -> huge value


def test_reconstruct_audio_chain(model_a, eval_ds):
    """Untrained model: the chain must still run end to end with correct
    shapes and finite metrics (the reference integration-test role,
    SURVEY §4.1)."""
    model, variables = model_a
    wave, clips, tail = eval_ds.utterance(0)
    msg = data.digit_watermarks(1)
    r = reconstruct_audio(wave, clips, tail, msg, model, variables,
                          attack="awgn-15", model_name="modelA")
    assert r.recon_audio.shape[-1] == len(np.asarray(wave).reshape(-1))
    assert r.att_audio.shape == r.recon_audio.shape
    assert r.wm_decoded.shape[1:] == (32, 32, 1)
    assert r.wm_decoded_att.shape[1:] == (32, 32, 1)
    assert np.isfinite([r.audio_mse, r.wm_mse, r.wm_mse_att, r.snr]).all()
    assert r.n_clips == clips.shape[0]


def test_evaluate_sweep_and_csv(model_a, eval_ds, tmp_path):
    """Sweep writes reference-format sample_result.txt lines and a
    parseable results.csv (evaluate.py:285-292, result_extract.py:12-42)."""
    model, variables = model_a
    msgs = data.digit_watermarks(2)
    out = str(tmp_path)
    results = evaluate_model(
        model, variables, {"test": eval_ds}, msgs,
        attacks=("closed_loop", "amplitude_scaling-0.8"),
        model_name="modelA", result_path=out)
    assert len(results) == 2
    txt = open(os.path.join(out, "sample_result.txt")).read()
    assert "Result on test set, attack: closed_loop:" in txt
    rows = process_data_to_csv(txt, os.path.join(out, "results2.csv"))
    assert len(rows) == 2
    assert rows[0]["Set"] == "test"
    assert rows[0]["Total Clips"] == results[0]["clips"]
    csv_text = open(os.path.join(out, "results.csv")).read()
    assert csv_text.startswith("Set,Attack,Total Clips,MSE Loss")


def test_closed_loop_attack_extract_consistency(model_a, eval_ds):
    """With closed_loop, the attacked extraction reads the same audio the
    no-attack path produced; for a model with bounded outputs both wm MSEs
    must be in [0, 1] and comparable."""
    model, variables = model_a
    wave, clips, tail = eval_ds.utterance(1)
    msg = data.digit_watermarks(1, seed=5)
    r = reconstruct_audio(wave, clips, tail, msg, model, variables,
                          attack="closed_loop", model_name="modelA")
    assert 0 <= r.wm_mse <= 1.0
    assert 0 <= r.wm_mse_att <= 1.0


def test_eval_pipeline_bucketed_compile_count():
    """VERDICT r1 weak #3: jit signatures are bucketed, so a sweep over
    many utterance lengths and attacks compiles O(1) programs (was one
    per distinct length)."""
    from image_in_speech_watermarking_tpu.eval import pipeline as P

    model = models.ModelA()
    waves = [data.synthetic_speech(16000 * 2 + 4001 * i, seed=i)
             for i in range(4)]
    ds = data.SpeechDataset(waves, kind="eval")
    msg = data.digit_watermarks(1)[0:1]
    v = model.init(jax.random.key(0),
                   jnp.asarray(ds.utterance(0)[1][:1]), jnp.asarray(msg))
    e0, x0 = P._embed_jit._cache_size(), P._extract_jit._cache_size()
    for i in range(4):
        w, c, t = ds.utterance(i)
        for att in ("closed_loop", "awgn-15", "jittering-100"):
            P.reconstruct_audio(w, c, t, msg, model, v, attack=att,
                                model_name="modelA")
    assert P._embed_jit._cache_size() - e0 <= 2
    assert P._extract_jit._cache_size() - x0 <= 3


def test_bucketed_embed_matches_unbucketed_numerics():
    """The frame-mask ISTFT makes clip-count padding numerically exact:
    the same utterance evaluated alone (bucket == true count) and padded
    (forced larger bucket) reconstructs identically."""
    from image_in_speech_watermarking_tpu.eval.pipeline import _embed_jit

    model = models.ModelA()
    wave = data.synthetic_speech(16000 * 2, seed=0)
    ds = data.SpeechDataset([wave], kind="eval")
    _, clips, tail = ds.utterance(0)
    msg = data.digit_watermarks(1)[0:1]
    v = model.init(jax.random.key(0), jnp.asarray(clips[:1]),
                   jnp.asarray(msg))
    n = clips.shape[0]
    vf = jnp.int32((n - 1) * 128 + tail)
    r1, _ = _embed_jit(model, v, jnp.asarray(clips), jnp.asarray(msg),
                       "modelA", "0", vf, 0.0, 1.0)
    padded = np.pad(np.asarray(clips),
                    ((0, 2 * n - n), (0, 0), (0, 0), (0, 0)))
    r2, _ = _embed_jit(model, v, jnp.asarray(padded), jnp.asarray(msg),
                       "modelA", "0", vf, 0.0, 1.0)
    L = len(wave)
    np.testing.assert_allclose(np.asarray(r1)[:L], np.asarray(r2)[:L],
                               atol=1e-6)


def test_device_roll_scoring_matches_host_roll(model_a, eval_ds):
    """_score_rolls_jit / _decode_rolls_jit roll ON DEVICE (gather mod
    valid_len + zero tail); decodes and blind confidences must equal the
    host path (np.roll -> pad -> _extract_jit) for every offset sign."""
    from image_in_speech_watermarking_tpu.config import (CLIP_FRAMES,
                                                         EVAL_HOP,
                                                         EVAL_N_FFT)
    from image_in_speech_watermarking_tpu.dsp.stft import num_frames
    from image_in_speech_watermarking_tpu.eval import pipeline as P
    from image_in_speech_watermarking_tpu.eval import sync

    model, variables = model_a
    wave = eval_ds.utterance(0)[0]
    L = len(wave)
    Lb = P._bucket(L, lo=16000)
    n_att = -(-num_frames(L, EVAL_N_FFT, EVAL_HOP) // CLIP_FRAMES)
    offs = np.asarray([0, 7, -13, 255], np.int32)

    dev = P._decode_rolls_jit(model, variables,
                              jnp.asarray(np.pad(wave, (0, Lb - L))),
                              jnp.asarray(offs), "modelA", "0",
                              jnp.int32(L))
    dev = np.asarray(dev)[:, :n_att]
    conf_dev, sat_dev = P._score_rolls_jit(
        model, variables, jnp.asarray(np.pad(wave, (0, Lb - L))),
        jnp.asarray(offs), "modelA", "0", jnp.int32(L), jnp.int32(n_att))

    for i, off in enumerate(offs):
        rolled = np.pad(np.roll(wave, -int(off)), (0, Lb - L))
        host = np.asarray(P._extract_jit(model, variables,
                                         jnp.asarray(rolled),
                                         "modelA", "0"))[:n_att]
        np.testing.assert_allclose(dev[i], host, atol=2e-5)
        assert abs(float(conf_dev[i]) - sync.confidence(host)) < 1e-4
        sat_host = np.mean(np.minimum(host, 1.0 - host), axis=(1, 2, 3))
        np.testing.assert_allclose(sat_dev[i][:n_att], sat_host,
                                   atol=1e-4)
