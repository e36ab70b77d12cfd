"""Hidden trainer contract tests (hidden/test_model.py:59,
hidden/utils.py:84-109)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data
from image_in_speech_watermarking_tpu.attacks import parse_noise_config
from image_in_speech_watermarking_tpu.config import HiDDenConfig
from image_in_speech_watermarking_tpu.train.hidden_trainer import Hidden

LOSS_KEYS = {"loss", "encoder_mse", "dec_mse", "bitwise-error",
             "adversarial_bce", "discr_cover_bce", "discr_encod_bce"}


def _batch(b=2, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.uniform(-1, 1, (b, 128, 128, 1)).astype(
        np.float32))
    msg = jnp.asarray(rng.integers(0, 2, (b, 32, 32, 1)).astype(
        np.float32))
    return img, msg


def test_validate_on_batch_contract():
    """losses, (encoded, noised, decoded) = net.validate_on_batch([i, m])
    (hidden/test_model.py:59)."""
    net = Hidden()
    img, msg = _batch()
    state = net.init_state(jax.random.key(0), img, msg)
    losses, (encoded, noised, decoded) = net.validate_on_batch(
        state, [img, msg])
    assert set(losses) == LOSS_KEYS
    assert encoded.shape == img.shape
    assert noised.shape == img.shape
    assert decoded.shape == msg.shape
    assert all(np.isfinite(v) for v in losses.values())


def test_train_on_batch_learns():
    """A few adversarial steps on one batch reduce the combined loss."""
    net = Hidden(noiser=parse_noise_config(""))  # identity-only noiser
    img, msg = _batch()
    state = net.init_state(jax.random.key(0), img, msg)
    first = None
    for i in range(12):
        state, losses, _ = net.train_on_batch(
            state, [img, msg], key=jax.random.key(i))
        if first is None:
            first = losses
    assert losses["loss"] < first["loss"]
    assert losses["dec_mse"] < first["dec_mse"]


def test_train_with_noiser_runs():
    noiser = parse_noise_config("dropout(0.55,0.6)+quant()")
    net = Hidden(noiser=noiser)
    img, msg = _batch()
    state = net.init_state(jax.random.key(0), img, msg)
    state, losses, tensors = net.train_on_batch(state, [img, msg],
                                                key=jax.random.key(7))
    assert np.isfinite(losses["loss"])


def test_checkpoint_dict_keys():
    """{enc-dec-model, enc-dec-optim, discrim-model, discrim-optim,
    epoch} (hidden/utils.py:84-90)."""
    net = Hidden()
    img, msg = _batch()
    state = net.init_state(jax.random.key(0), img, msg)
    payload = net.checkpoint_payload(state, epoch=7)
    assert set(payload) == {"enc-dec-model", "enc-dec-optim",
                            "discrim-model", "discrim-optim", "epoch"}
    state2 = net.state_from_checkpoint(payload)
    l1, _ = net.validate_on_batch(state, [img, msg])
    l2, _ = net.validate_on_batch(state2, [img, msg])
    assert abs(l1["loss"] - l2["loss"]) < 1e-6
