"""Model contract tests: shapes, arities and gradients match the reference
call sites (SURVEY §3.2, uformerWM/audio_test.py:552-555,
uformerWM/audio_uformer_stft.py:452)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu.config import UformerConfig
from image_in_speech_watermarking_tpu import models

B = 2


def small_cfg(**kw):
    """Tiny UformerAudio for fast CPU tests (depths all 1, embed 8,
    img 64 with the matching 127-point channel-sim STFT)."""
    base = dict(img_size=64, embed_dim=8,
                depths=(1, 1, 1, 1, 1, 1, 1, 1, 1),
                num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2), modulator=True,
                n_fft=127, hop_length=31)
    base.update(kw)
    return UformerConfig(**base)


@pytest.fixture(scope="module")
def uformer_audio():
    model = models.UformerAudio(small_cfg())
    x = jnp.zeros((B, 64, 64, 2))
    msg = jnp.zeros((B, 32, 32, 1))
    params = model.init(jax.random.key(0), x, msg)
    return model, params


def test_uformer_audio_forward_arity(uformer_audio):
    """model(stft, msg) -> 4-tuple (audio, noise, wm_pred, wm)
    (model.py:2511)."""
    model, params = uformer_audio
    x = jax.random.normal(jax.random.key(1), (B, 64, 64, 2)) * 0.1
    msg = jax.random.uniform(jax.random.key(2), (B, 32, 32, 1))
    audio, noise, wm_pred, wm = model.apply(params, x, msg)
    assert audio.shape == (B, 64, 64, 2)
    assert noise.shape == (B, 64, 64, 2)
    assert wm_pred.shape == (B, 32, 32, 1)
    assert wm.shape == (B, 32, 32, 1)
    for t in (audio, noise, wm_pred, wm):
        assert np.isfinite(np.asarray(t)).all()
    # decode heads are sigmoid-bounded (model.py:1740)
    assert float(wm.min()) >= 0 and float(wm.max()) <= 1


def test_uformer_audio_wm_decode_method(uformer_audio):
    """model.wm_decode(clip) used by the attack-eval path
    (uformerWM/audio_test.py:707)."""
    model, params = uformer_audio
    y = jax.random.normal(jax.random.key(3), (B, 64, 64, 2)) * 0.1
    wm = model.apply(params, y, method=model.wm_decode)
    assert wm.shape == (B, 32, 32, 1)


def test_uformer_audio_grads(uformer_audio):
    """All four loss terms produce finite grads through the full graph,
    including the istft->stft channel sim."""
    model, params = uformer_audio
    x = jax.random.normal(jax.random.key(4), (B, 64, 64, 2)) * 0.1
    msg = jax.random.uniform(jax.random.key(5), (B, 32, 32, 1))

    def loss_fn(p):
        audio, noise, wm_pred, wm = model.apply(p, x, msg)
        nn_ = jnp.linalg.norm(noise.reshape(-1)) / B
        return (jnp.mean((audio - x) ** 2) + jnp.mean((wm_pred - msg) ** 2)
                + jnp.mean((wm - msg) ** 2) + (nn_ - 1.0) ** 2)

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert leaves
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_conv_autoencoder_shapes():
    m = models.ConvAutoencoder(in_chans=1)
    x = jnp.zeros((B, 32, 32, 1))
    params = m.init(jax.random.key(0), x)
    f, y = m.apply(params, x)
    assert f.shape == (B, 8, 8, 4)      # (4,8,8) NCHW in the reference
    assert y.shape == (B, 32, 32, 1)


def test_model_a_contract():
    """ModelA 2-tuple calling convention (audio_test.py:555,
    model.py:3062-3066)."""
    m = models.ModelA()
    stft = jnp.zeros((B, 128, 128, 2))
    wm = jnp.zeros((B, 32, 32, 1))
    variables = m.init(jax.random.key(0), stft, wm)
    encoded, extracted = m.apply(variables, stft, wm)
    assert encoded.shape == (B, 128, 128, 2)
    assert extracted.shape == (B, 32, 32, 1)
    assert float(encoded.min()) >= 0 and float(encoded.max()) <= 1  # sigmoid
    dec = m.apply(variables, encoded, method=m.decode)
    assert dec.shape == (B, 32, 32, 1)


def test_unet_residual():
    m = models.UNet(dim=8)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.key(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape


def test_stock_uformer():
    cfg = small_cfg(img_size=64, in_chans=3, dd_in=3, modulator=False)
    m = models.Uformer(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.key(0), x)
    assert m.apply(p, x).shape == (1, 64, 64, 3)


def test_hidden_encoder_decoder():
    """HiDDeN contract: validate-on-batch tuple shapes
    (hidden/test_model.py:59, decoder output is a 32x32 image per
    hidden/model/decoder.py:6-40)."""
    m = models.HiddenEncoderDecoder()
    img = jnp.zeros((B, 128, 128, 1))
    msg = jnp.zeros((B, 32, 32, 1))
    variables = m.init(jax.random.key(0), img, msg)
    encoded, noised, decoded = m.apply(variables, img, msg)
    assert encoded.shape == (B, 128, 128, 1)
    assert noised.shape == (B, 128, 128, 1)
    assert decoded.shape == (B, 32, 32, 1)


def test_hidden_discriminator():
    m = models.HiddenDiscriminator()
    x = jnp.zeros((B, 128, 128, 1))
    p = m.init(jax.random.key(0), x)
    assert m.apply(p, x).shape == (B, 1)


def test_registry_archs():
    for arch in ("Uformer_audio", "ModelA", "UNet"):
        m = models.get_arch(arch)
        assert m is not None


def test_shifted_window_mixes_across_windows():
    """Shift-flag blocks must move information across window borders:
    with depths>=2 at level 0 a delta at (0,0) influences tokens beyond
    its own 8x8 window."""
    from image_in_speech_watermarking_tpu.models.layers import (
        BasicUformerLayer)
    layer = BasicUformerLayer(dim=8, input_resolution=(16, 16), depth=2,
                              num_heads=2, win_size=8, shift_flag=True)
    x0 = jax.random.normal(jax.random.key(9), (1, 256, 8))
    p = layer.init(jax.random.key(0), x0)
    x1 = x0.at[0, 0, :].add(jax.random.normal(jax.random.key(10), (8,)))
    d = jnp.abs(layer.apply(p, x1) - layer.apply(p, x0))[0].sum(-1)
    # token (11, 11) lives in a different 8x8 window than (0, 0) and is
    # reachable through the shifted window (not in the wrap-masked border
    # region, which for a 16x16 grid is rows/cols >= 12).
    assert float(d.reshape(16, 16)[11, 11]) > 0
    # wrap region must stay isolated from (0,0) after one shift cycle
    assert float(d.reshape(16, 16)[15, 15]) == 0
