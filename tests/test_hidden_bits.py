"""Bit-vector (upstream-HiDDeN protocol) mode: mask replay + trainer.

The hidden/README.md:94-101 bitwise-error table was measured under the
upstream HiDDeN protocol (length-L bit messages, global-pooled decoder,
COCO covers — see runfiles/*.sh), not the snapshot's 32x32 image-message
decoder. ``message_mode='bits'`` reproduces that protocol; these tests
pin the pieces that differ from image mode.
"""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu.attacks.noise_layers import (
    parse_noise_config)
from image_in_speech_watermarking_tpu.config import HiDDenConfig
from image_in_speech_watermarking_tpu.models.hidden import (
    HiddenDecoderBits, HiddenEncoderDecoder)
from image_in_speech_watermarking_tpu.train.hidden_trainer import Hidden


def test_valid_mask_replays_crop_rectangle():
    """valid_mask must reproduce EXACTLY the rectangle the crop branch
    keeps for the same key (same split, same branch pick, same draw)."""
    noiser = parse_noise_config("crop((0.2,0.25),(0.2,0.25))")
    x = jnp.ones((2, 64, 64, 1))
    hits = 0
    for s in range(8):
        key = jax.random.key(s)
        noised = noiser(key, x, x)
        mask = noiser.valid_mask(key, x.shape)
        if float(noised.sum()) == float(x.sum()):
            # identity branch picked: mask must be all-ones
            assert float(mask.min()) == 1.0
        else:
            hits += 1
            np.testing.assert_array_equal(
                np.asarray(noised[0, :, :, 0] != 0.0),
                np.asarray(mask != 0.0))
    assert hits >= 2     # crop branch exercised at least twice over seeds


def test_valid_mask_full_frame_for_non_crop():
    noiser = parse_noise_config("dropout(0.55,0.6)+quant()")
    mask = noiser.valid_mask(jax.random.key(3), (1, 32, 32, 1))
    assert mask.shape == (32, 32)
    assert float(mask.min()) == 1.0


def test_bits_decoder_masked_pool_uses_only_valid_region():
    cfg = HiDDenConfig(message_length=8, message_mode="bits",
                       decoder_blocks=2, decoder_channels=4)
    dec = HiddenDecoderBits(cfg)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 32, 32, 1)).astype(np.float32))
    params = dec.init(jax.random.key(0), x)
    full = dec.apply(params, x)
    assert full.shape == (1, 8)
    half = jnp.zeros((32, 32)).at[:, :16].set(1.0)
    masked = dec.apply(params, x, valid_mask=half)
    # pooling over half the frame must differ from pooling over all of it
    assert float(jnp.abs(masked - full).max()) > 1e-6


def test_bits_mode_train_and_val_step():
    cfg = HiDDenConfig(message_length=12, message_mode="bits",
                       encoder_blocks=2, encoder_channels=8,
                       decoder_blocks=2, decoder_channels=8,
                       discriminator_blocks=2, discriminator_channels=8)
    noiser = parse_noise_config("crop((0.4,0.55),(0.4,0.55))")
    net = Hidden(cfg, noiser=noiser, adv_loss="lsgan", ema_decay=0.99)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    msg = jnp.asarray(rng.integers(0, 2, (2, 12)).astype(np.float32))
    state = net.init_state(jax.random.key(0), img, msg)
    state, losses, (enc, noi, dec) = net.train_on_batch(
        state, [img, msg], key=jax.random.key(1))
    assert dec.shape == (2, 12)
    assert np.isfinite(losses["loss"]) and np.isfinite(
        losses["bitwise-error"])
    vlosses, _ = net.validate_on_batch(state, [img, msg],
                                       key=jax.random.key(2))
    assert np.isfinite(vlosses["bitwise-error"])


def test_bits_mode_learns_without_noise():
    """A tiny bits model overfits a fixed batch in a few dozen steps —
    bitwise error must drop well below chance (0.5)."""
    cfg = HiDDenConfig(message_length=8, message_mode="bits",
                       encoder_blocks=2, encoder_channels=8,
                       decoder_blocks=2, decoder_channels=8,
                       use_discriminator=False)
    net = Hidden(cfg, noiser=None, lr=5e-3)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((4, 32, 32, 1)).astype(np.float32))
    msg = jnp.asarray(rng.integers(0, 2, (4, 8)).astype(np.float32))
    state = net.init_state(jax.random.key(0), img, msg)
    first_mse, err, mse = None, None, None
    for i in range(100):
        state, losses, _ = net.train_on_batch(
            state, [img, msg], key=jax.random.key(i))
        err, mse = float(losses["bitwise-error"]), float(losses["dec_mse"])
        if first_mse is None:
            first_mse = mse
    assert err is not None and err <= 0.2, (err, mse)
    assert mse < first_mse / 3, (first_mse, mse)
