"""Variant models, heritage losses, and the coif1 DWT."""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu.config import UformerConfig
from image_in_speech_watermarking_tpu.dsp import dwt as dwtmod
from image_in_speech_watermarking_tpu.models.variants import (
    UformerAudioMod, UformerAudioV2, UformerAudioV4)
from image_in_speech_watermarking_tpu.train.losses import (charbonnier_loss,
                                                           tv_loss)

CFG = UformerConfig(img_size=64, embed_dim=8,
                    depths=(1, 1, 1, 1, 1, 1, 1, 1, 1),
                    num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2),
                    n_fft=127, hop_length=31)
B = 1


def _inputs():
    x = jax.random.normal(jax.random.key(0), (B, 64, 64, 2)) * 0.1
    msg = jax.random.uniform(jax.random.key(1), (B, 32, 32, 1))
    return x, msg


def test_v2_arity():
    """V2 returns (y, noise, wm_pred, wm) (model.py:1987-1989)."""
    m = UformerAudioV2(CFG)
    x, msg = _inputs()
    p = m.init({"params": jax.random.key(0), "attack": jax.random.key(9)},
               x, msg)
    y, noise, wm_pred, wm = m.apply(p, x, msg,
                                    rngs={"attack": jax.random.key(3)})
    assert y.shape == x.shape and noise.shape == x.shape
    assert wm_pred.shape == msg.shape and wm.shape == msg.shape


def test_v4_and_mod_arity():
    """V4 and Mod return 3-tuples (model.py:2182, 2936)."""
    x, msg = _inputs()
    for cls in (UformerAudioV4, UformerAudioMod):
        m = cls(CFG)
        p = m.init(jax.random.key(0), x, msg)
        y, wm_pred, wm = m.apply(p, x, msg)
        assert y.shape == x.shape
        assert wm_pred.shape == msg.shape and wm.shape == msg.shape


def test_mod_discriminators():
    """The discriminator heads are attached but only reachable through
    discriminate() — like the reference, where they are instantiated and
    never trained (model.py:2852-2858). Params for them come from
    initializing that method."""
    m = UformerAudioMod(CFG)
    x, msg = _inputs()
    wm_img = jnp.zeros((B, 32, 32, 1))
    p = m.init(jax.random.key(0), wm_img, x, method=m.discriminate)
    dm, dc = m.apply(p, wm_img, x, method=m.discriminate)
    assert dm.shape == (B, 1) and dc.shape == (B, 1)


def test_charbonnier_and_tv():
    """CharbonnierLoss(x,x)=eps, matches sqrt(d^2+eps^2) mean
    (losses.py:8-19)."""
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    y = x + 0.1
    ref = float(jnp.mean(jnp.sqrt(0.01 + 1e-6)))
    assert abs(float(charbonnier_loss(x, y)) - ref) < 1e-6
    assert float(charbonnier_loss(x, x)) <= 1e-3 + 1e-6
    assert float(tv_loss(jnp.ones((1, 8, 8, 1)))) == 0.0
    assert float(tv_loss(x)) > 0


def test_dwt_perfect_reconstruction():
    """idwt(dwt(x)) == x — the property the reference's dwt data mode
    relies on (hidden/audio_test.py:150-152, pywt coif1)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    ca, cd = dwtmod.dwt(x)
    assert ca.shape[-1] == (4096 + 5) // 2
    back = dwtmod.idwt(ca, cd, out_len=4096)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_dwt_lowpass_highpass_split():
    """cA carries a slow sine; cD carries high-frequency content."""
    t = np.arange(2048) / 16000
    slow = jnp.asarray(np.sin(2 * np.pi * 100 * t).astype(np.float32))
    ca, cd = dwtmod.dwt(slow)
    assert float(jnp.abs(ca).mean()) > 10 * float(jnp.abs(cd).mean())
