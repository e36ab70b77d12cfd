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


def test_stabilizers_ema_r1_ttur():
    """Round-4 adversarial stabilizers: EMA params tracked, validated
    and checkpointed; R1 + TTUR train steps stay finite; defaults keep
    the reference-parity payload keys."""
    cfg = HiDDenConfig(H=32, W=32, message_length=8, encoder_blocks=2,
                       encoder_channels=8, decoder_blocks=2,
                       decoder_channels=8, discriminator_blocks=2,
                       discriminator_channels=8)
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    msg = jnp.asarray(rng.integers(0, 2, (2, 8, 8, 1)).astype(np.float32))
    net = Hidden(cfg, adv_loss="lsgan", ema_decay=0.99, disc_lr=2e-4,
                 r1_gamma=10.0)
    st = net.init_state(jax.random.key(0), img, msg)
    assert st.ema is not None
    for i in range(3):
        st, losses, _ = net.train_on_batch(st, [img, msg],
                                           key=jax.random.key(i))
    assert np.isfinite(losses["loss"])
    # EMA lags params but is not frozen at init
    gaps = jax.tree.leaves(jax.tree.map(
        lambda e, p: float(np.abs(np.asarray(e) - np.asarray(p)).max()),
        st.ema, st.enc_dec["params"]))
    assert 0 < max(gaps) < 1.0
    # ema_state swaps the validated weights
    vl_raw, _ = net.validate_on_batch(st, [img, msg])
    vl_ema, _ = net.validate_on_batch(net.ema_state(st), [img, msg])
    assert vl_raw["loss"] != vl_ema["loss"]
    payload = net.checkpoint_payload(st, epoch=1)
    assert "enc-dec-ema" in payload
    st2 = net.state_from_checkpoint(payload)
    assert st2.ema is not None
