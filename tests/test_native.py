"""Native audio runtime (C++ via ctypes) vs numpy fallbacks."""

import numpy as np
import pytest

from image_in_speech_watermarking_tpu.data import native


def test_native_builds():
    """g++ toolchain present in CI: the library must build and load."""
    assert native.have_native()


def test_wav_roundtrip_16bit(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    p = str(tmp_path / "a.wav")
    native.wav_write(p, x, 16000, bits=16)
    y, sr = native.wav_read(p)
    assert sr == 16000 and len(y) == len(x)
    assert np.abs(y - x).max() < 1.0 / 32768 + 1e-6


def test_wav_u8_matches_requant_attack(tmp_path):
    """PCM_U8 write+read == the requantization attack's file round trip
    (audio_attack.py:87-96)."""
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(8000) * 0.3).astype(np.float32)
    p = str(tmp_path / "b.wav")
    native.wav_write(p, x, 16000, bits=8)
    y, _ = native.wav_read(p)
    q = native.pcm_requantize(x, bits=8)
    np.testing.assert_allclose(y, q, atol=1e-6)


def test_pcm_requantize_matches_jax_attack():
    import jax
    import jax.numpy as jnp

    from image_in_speech_watermarking_tpu.attacks import waveform

    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4000) * 0.5).astype(np.float32)
    host = native.pcm_requantize(x, bits=8)
    dev = np.asarray(waveform.requantization(jax.random.key(0),
                                             jnp.asarray(x)))
    np.testing.assert_allclose(host, dev, atol=1e-6)


def test_frame_signal_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(1000).astype(np.float32)
    frames = native.frame_signal(x, 256, 63, pad=127)
    xp = np.pad(x, 127, mode="reflect")
    num = 1 + (len(xp) - 256) // 63
    idx = np.arange(num)[:, None] * 63 + np.arange(256)[None, :]
    np.testing.assert_allclose(frames, xp[idx], atol=0)


def test_numpy_fallback_paths(tmp_path, monkeypatch):
    """Force the fallback and check identical behavior."""
    monkeypatch.setattr(native, "get_lib", lambda: None)
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(4000) * 0.2).astype(np.float32)
    p = str(tmp_path / "c.wav")
    native.wav_write(p, x, 16000, bits=16)
    y, sr = native.wav_read(p)
    assert sr == 16000
    assert np.abs(y - x).max() < 1.0 / 32768 + 1e-6
    q = native.pcm_requantize(x)
    assert np.abs(q - x).max() <= 1 / 256 + 1e-6
    f = native.frame_signal(x, 128, 64)
    assert f.shape == (1 + (4000 - 128) // 64, 128)
