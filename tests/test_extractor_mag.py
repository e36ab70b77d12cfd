"""Phase-invariant magnitude payload channel (UformerConfig.extractor_mag).

Round-4 quality work: the whole-wave phase-vocoder attacks decohere
accumulated synthesis phase (a random smooth all-pass), which destroys
the real/imag embedding; |STFT| survives. The extractor optionally reads
|STFT| as a third input channel. These tests pin the compatibility
contract: flag off is reference parity, and a 2-channel checkpoint poured
into a 3-channel model via the zero-pad surgery computes EXACTLY the
2-channel function before fine-tuning moves the new kernel slice.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.config import TrainConfig, UformerConfig

CFG = UformerConfig(img_size=64, embed_dim=8, depths=(1,) * 9,
                    num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2), modulator=True,
                    n_fft=127, hop_length=31)
CFG_MAG = dataclasses.replace(CFG, extractor_mag=True)


def _pad_extractor_kernel(params):
    """The trainer surgery in miniature: zero-pad the extractor
    input_proj kernel's in-channel dim 2 -> 3."""
    p = jax.tree.map(np.asarray, params)
    k = p["decoder_wm"]["input_proj"]["proj"]["kernel"]
    p["decoder_wm"]["input_proj"]["proj"]["kernel"] = np.pad(
        k, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return p


def test_mag_channel_zero_pad_is_exact_identity():
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    base = models.UformerAudio(CFG)
    v2 = jax.jit(base.init)(jax.random.key(1), x, msg)
    mag = models.UformerAudio(CFG_MAG)
    v3 = {"params": _pad_extractor_kernel(v2["params"])}
    # shapes must match a fresh 3-channel init
    fresh = jax.eval_shape(mag.init, jax.random.key(1), x, msg)
    jax.tree.map(lambda a, b: None if np.shape(a) == b.shape
                 else pytest.fail(f"{np.shape(a)} != {b.shape}"),
                 v3["params"], fresh["params"])
    out2 = jax.jit(base.apply)(v2, x, msg)
    out3 = jax.jit(mag.apply)(v3, x, msg)
    for a, b in zip(out2, out3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)


def test_mag_channel_sees_through_global_phase_flip():
    """The magnitude feature is invariant to a global phase rotation of
    the clip (RI -> -RI), while the RI channels are not: with a random
    3-channel extractor the decode must differ under the flip, but the
    magnitude input plane itself is bit-identical (the invariance the
    fine-tune trains the payload into)."""
    cfg = CFG_MAG
    x = jax.random.normal(jax.random.key(2), (1, 64, 64, 2)) * 0.1
    ri = x[..., :2]
    mag = jnp.sqrt(jnp.sum(jnp.square(ri), axis=-1, keepdims=True) + 1e-12)
    mag_flip = jnp.sqrt(jnp.sum(jnp.square(-ri), axis=-1,
                                keepdims=True) + 1e-12)
    np.testing.assert_array_equal(np.asarray(mag), np.asarray(mag_flip))


def test_init_from_two_channel_checkpoint_surgery(tmp_path):
    """--init_from a 2-channel-extractor checkpoint into an
    extractor_mag model: the trainer's zero-pad surgery restores the
    exact stored function (first forward matches the 2-channel model)."""
    from image_in_speech_watermarking_tpu.train import Trainer
    from image_in_speech_watermarking_tpu.train import checkpoint as ckpt

    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    tcfg = TrainConfig(batch_size=2, nepoch=1)

    base = models.UformerAudio(CFG)
    tr2 = Trainer(base, tcfg, steps_per_epoch=1)
    st2 = tr2.init_state(x, msg)
    path = str(tmp_path / "model")
    ckpt.save(path, st2, epoch=3)

    mag = models.UformerAudio(CFG_MAG)
    tr3 = Trainer(mag, tcfg, steps_per_epoch=1)
    st3 = tr3.init_state(x, msg)
    st3, _ = tr3._restore_state(path, st3, params_only=True)
    out2 = jax.jit(base.apply)({"params": st2.params}, x, msg)
    out3 = jax.jit(mag.apply)({"params": st3.params}, x, msg)
    for a, b in zip(out2, out3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6)
    # a genuinely wrong shape still raises (strictness preserved)
    st_bad = tr2.init_state(x[..., :1].repeat(2, -1), msg)  # same shapes
    with pytest.raises(ValueError):
        wrong = dataclasses.replace(
            st2, params=jax.tree.map(
                lambda p: p[..., :-1] if p.ndim == 4 and p.shape[-1] > 1
                else p, st2.params))
        ckpt.save(str(tmp_path / "bad"), wrong, epoch=1)
        tr3._restore_state(str(tmp_path / "bad"), st_bad,
                           params_only=True)
