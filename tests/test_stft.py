"""STFT/ISTFT parity vs torch (the reference's numeric substrate).

The reference relies on torch.stft/istft exactness:
  - train config n_fft=256 hop=128 win=256 (uformerWM/audio_test.py:465-469)
  - eval config n_fft=255 (hop=63) incl. in-graph istft∘stft round trip
    (uformerWM/model.py:2458-2463) and `length=` trimming
    (uformerWM/audio_test.py:596-600).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from image_in_speech_watermarking_tpu import dsp

CONFIGS = [
    dict(n_fft=256, hop_length=128, win_length=256),  # train
    dict(n_fft=255, hop_length=None, win_length=None),  # eval (torch defaults)
]


def _rand(l, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(l).astype(np.float32) * 0.1


@pytest.mark.parametrize("cfg", CONFIGS)
@pytest.mark.parametrize("method", ["matmul", "fft"])
def test_stft_matches_torch(cfg, method):
    x = _rand(16000)
    ours = dsp.stft_ri(jnp.asarray(x), method=method, **cfg)
    theirs = torch.stft(
        torch.from_numpy(x), n_fft=cfg["n_fft"],
        hop_length=cfg["hop_length"], win_length=cfg["win_length"],
        return_complex=False,
    ).numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("cfg", CONFIGS)
def test_istft_matches_torch(cfg):
    x = _rand(16000, seed=1)
    spec = torch.stft(
        torch.from_numpy(x), n_fft=cfg["n_fft"],
        hop_length=cfg["hop_length"], win_length=cfg["win_length"],
        return_complex=True,
    )
    theirs = torch.istft(
        spec, n_fft=cfg["n_fft"], hop_length=cfg["hop_length"],
        win_length=cfg["win_length"], length=len(x),
    ).numpy()
    spec_ri = np.stack([spec.real.numpy(), spec.imag.numpy()], -1)
    ours = dsp.istft_ri(jnp.asarray(spec_ri), n_fft=cfg["n_fft"],
                        hop_length=cfg["hop_length"],
                        win_length=cfg["win_length"], length=len(x))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=1e-3)


def test_roundtrip_identity():
    """istft∘stft ≈ id, the property the in-model channel sim depends on."""
    x = _rand(8128, seed=2)
    spec = dsp.stft_ri(jnp.asarray(x), n_fft=255)
    y = dsp.istft_ri(spec, n_fft=255, length=len(x))
    np.testing.assert_allclose(np.asarray(y), x, atol=1e-4)


def test_roundtrip_differentiable():
    """Gradient flows through istft∘stft (model.py:2458-2463 is on the
    training graph)."""
    x = jnp.asarray(_rand(4096, seed=3))

    def loss(x):
        s = dsp.stft_ri(x, n_fft=255)
        y = dsp.istft_ri(s, n_fft=255, length=x.shape[-1])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_batched_and_jitted():
    xs = jnp.asarray(np.stack([_rand(16000, s) for s in range(4)]))
    f = jax.jit(lambda x: dsp.stft_ri(x, n_fft=256, hop_length=128,
                                      win_length=256))
    out = f(xs)
    assert out.shape == (4, 129, 126, 2)
    ref = dsp.stft_ri(xs[1], n_fft=256, hop_length=128, win_length=256)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref),
                               atol=1e-5)


def test_clip_chunking_roundtrip():
    """Pad-to-128 clip split and merge (uformerWM/audio_test.py:319-347)."""
    x = _rand(100_000, seed=4)
    spec = dsp.stft_ri(jnp.asarray(x), n_fft=255)  # (128, T, 2)
    clips, valid = dsp.spec_to_clips(spec, 128)
    assert clips.shape[1:] == (128, 128, 2)
    back = dsp.clips_to_spec(clips, valid)
    assert back.shape == spec.shape
    np.testing.assert_allclose(np.asarray(back), np.asarray(spec))


def test_train_config_bins_drop():
    """Train pipeline drops the 129th bin to get 128x128 clips
    (uformerWM/audio_test.py:465-469)."""
    x = _rand(33_000, seed=5)
    spec = dsp.stft_ri(jnp.asarray(x), n_fft=256, hop_length=128,
                       win_length=256)
    clips, _ = dsp.spec_to_clips(spec, 128, drop_last_bin=True)
    assert clips.shape[1:] == (128, 128, 2)
