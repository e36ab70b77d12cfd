"""Serving API: embed/extract over arbitrary-length audio with bucketed
jit signatures."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu import data, models, serve
from image_in_speech_watermarking_tpu.config import UformerConfig


@pytest.fixture(scope="module")
def wmk():
    cfg = UformerConfig(img_size=128, embed_dim=8, depths=(1,) * 9,
                        num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2),
                        modulator=True)
    model = models.UformerAudio(cfg)
    x = jnp.zeros((1, 128, 128, 2))
    msg = jnp.zeros((1, 32, 32, 1))
    variables = model.init(jax.random.key(0), x, msg)
    return serve.Watermarker(model, variables)


def test_embed_preserves_length_and_is_close(wmk):
    for n in (20_000, 47_123):
        wave = data.synthetic_speech(n, seed=1)
        msg = data.digit_watermarks(1)[0, :, :, 0]
        out = wmk.embed(wave, msg)
        assert out.shape == (n,)
        assert np.isfinite(out).all()
        # additive residual model: output stays within a few x of input
        assert np.abs(out - wave).mean() < 10 * np.abs(wave).mean()


def test_extract_shapes(wmk):
    wave = data.synthetic_speech(30_000, seed=2)
    wm = wmk.extract(wave)
    assert wm.shape == (32, 32)
    per = wmk.extract(wave, per_clip=True)
    assert per.shape[1:] == (32, 32) and per.shape[0] >= 1
    assert 0.0 <= wm.min() and wm.max() <= 1.0  # sigmoid decode head


def test_bucket_bounds_recompiles(wmk):
    """Different lengths in the same wave bucket reuse one jit entry."""
    assert serve._bucket(3) == 4 and serve._bucket(4) == 4
    assert serve._bucket(5) == 8
    msg = data.digit_watermarks(1)[0, :, :, 0]
    wmk.embed(data.synthetic_speech(20_000, seed=3), msg)
    sizes0 = wmk._embed_fn._cache_size()
    wmk.embed(data.synthetic_speech(24_000, seed=4), msg)  # same bucket
    assert wmk._embed_fn._cache_size() == sizes0
