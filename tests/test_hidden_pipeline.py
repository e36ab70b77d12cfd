"""HiDDeN whole-utterance eval chain (audio + dwt + stft modes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu import data
from image_in_speech_watermarking_tpu.eval.hidden_pipeline import (
    reconstruct_audio_hidden)
from image_in_speech_watermarking_tpu.train.hidden_trainer import Hidden


@pytest.fixture(scope="module")
def net_state():
    net = Hidden()
    img = jnp.zeros((1, 128, 128, 1))
    msg = jnp.zeros((1, 32, 32, 1))
    state = net.init_state(jax.random.key(0), img, msg)
    return net, state


@pytest.fixture(scope="module")
def net_state_2ch():
    """2-channel cover nets for the stft mode (real/imag clips,
    hidden/audio_test.py:203-239)."""
    net = Hidden(cover_channels=2)
    img = jnp.zeros((1, 128, 128, 2))
    msg = jnp.zeros((1, 32, 32, 1))
    state = net.init_state(jax.random.key(0), img, msg)
    return net, state


@pytest.mark.slow
def test_reconstruct_chain_stft(net_state_2ch):
    net, state = net_state_2ch
    wave = data.synthetic_speech(40000, seed=3)
    msg = data.digit_watermarks(1, seed=2)
    r = reconstruct_audio_hidden(net, state, wave, msg,
                                 attack="awgn-15", data_mode="stft")
    assert r.recon_audio.shape == (40000,)
    assert r.decoded.shape[1:] == (32, 32, 1)
    assert r.decoded_att.shape[1:] == (32, 32, 1)
    assert np.isfinite([r.audio_mse, r.wm_mse, r.wm_mse_att,
                        r.bitwise_err_att]).all()


@pytest.mark.parametrize("mode", ["audio", "dwt"])
@pytest.mark.slow
def test_reconstruct_chain(net_state, mode):
    net, state = net_state
    wave = data.synthetic_speech(40000, seed=3)
    msg = data.digit_watermarks(1, seed=2)
    r = reconstruct_audio_hidden(net, state, wave, msg,
                                 attack="awgn-15", data_mode=mode)
    assert r.recon_audio.shape == (40000,)
    assert r.att_audio.shape == (40000,)
    assert r.decoded.shape[1:] == (32, 32, 1)
    assert r.decoded_att.shape[1:] == (32, 32, 1)
    assert np.isfinite([r.audio_mse, r.wm_mse, r.wm_mse_att,
                        r.bitwise_err_att]).all()
    assert 0.0 <= r.bitwise_err_att <= 1.0


def test_identity_encoder_roundtrip(net_state):
    """With encoded == clips (mock), the waveform reconstruction is exact
    for both featurizations."""
    from image_in_speech_watermarking_tpu.eval import hidden_pipeline as hp

    wave = jnp.asarray(data.synthetic_speech(50000, seed=4))
    for mode in ("audio", "dwt", "stft"):
        clips, tail, coeff_len = hp._featurize(wave, mode)
        recon = hp._defeaturize(clips, coeff_len, wave.shape[-1], mode)
        np.testing.assert_allclose(np.asarray(recon), np.asarray(wave),
                                   atol=5e-4)
