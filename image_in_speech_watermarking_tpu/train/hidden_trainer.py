"""HiDDeN adversarial trainer: the ``Hidden`` wrapper contract.

The reference's ``hidden/model/hidden.py`` is absent from the snapshot;
this implements its call contract exactly as used by the surviving code:

  Hidden(config, noiser)                       hidden/test_model.py:46
  .train_on_batch([img, msg]) -> losses, (encoded, noised, decoded)
  .validate_on_batch([img, msg]) -> same      hidden/test_model.py:59,
                                               hidden/audio_test.py:423
  .encoder_decoder.{encoder,decoder}           hidden/utils.py:84-90,
  .discriminator                               hidden/audio_test.py:554,606
  checkpoint dict {enc-dec-model, enc-dec-optim, discrim-model,
  discrim-optim, epoch}                        hidden/utils.py:76-90

Losses per the published HiDDeN training scheme with the weights of
HiDDenConfiguration (hidden/options.py:46-48): image MSE * encoder_loss +
message MSE * decoder_loss + generator BCE * adversarial_loss; the
discriminator trains on cover-vs-encoded BCE. Both updates run in ONE jit
program (the discriminator sees stop_gradient(encoded), so a single
backward pass serves both optimizers).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from image_in_speech_watermarking_tpu.config import HiDDenConfig
from image_in_speech_watermarking_tpu.models.hidden import (
    HiddenDiscriminator, HiddenEncoderDecoder)


@flax.struct.dataclass
class HiddenState:
    enc_dec: Any            # {'params':..., 'batch_stats':...}
    discrim: Any
    opt_enc_dec: Any
    opt_discrim: Any
    step: jnp.ndarray
    # EMA of enc_dec params (None = disabled): the shipped/validated
    # weights for long adversarial runs — late-training GAN oscillation
    # (crop/cropout regimes: val bitwise error swinging 0.01<->0.35 over
    # the last 100 epochs) averages out in parameter space while the raw
    # weights keep training.
    ema: Any = None


def _bce_logits(logits, target):
    return optax.sigmoid_binary_cross_entropy(
        logits, jnp.full_like(logits, target)).mean()


def _lsgan_logits(logits, target):
    """Least-squares GAN objective (Mao et al. 2017): MSE on raw logits
    vs the 0/1 target. Bounded and saturation-free — the BCE objective
    explodes late in training once the discriminator saturates (observed
    in the round-2 noise-regime runs: adversarial BCE 14->70 while val
    bitwise error degraded 30x)."""
    return jnp.mean((logits - target) ** 2)


class Hidden:
    """Encoder/decoder + discriminator trainer (the reconstructed
    hidden/model/hidden.py)."""

    def __init__(self, config: HiDDenConfig = HiDDenConfig(),
                 noiser=None, lr: float = 1e-3,
                 cover_channels: int = 1, adv_loss: str = "bce",
                 ema_decay: float = 0.0,
                 disc_lr: Optional[float] = None,
                 r1_gamma: float = 0.0):
        """``adv_loss``: 'bce' (reference parity) or 'lsgan'
        (saturation-free; stabilizes long noise-regime runs).

        Round-4 adversarial stabilizers (all off by default = reference
        parity; for the crop/cropout regimes whose validation bitwise
        error oscillates 0.01<->0.35 late in training):
          ``ema_decay``: per-step EMA of the enc/dec params; the EMA
            weights are what gets validated/shipped (state.ema).
          ``disc_lr``: separate (lower) discriminator lr — TTUR; the
            default ties it to ``lr``.
          ``r1_gamma``: R1 gradient penalty (Mescheder et al. 2018)
            gamma/2 * E||grad_x D(x)||^2 on cover images, damping the
            discriminator's late-training sharpening."""
        assert adv_loss in ("bce", "lsgan"), adv_loss
        self.adv_loss = adv_loss
        self._gan = _bce_logits if adv_loss == "bce" else _lsgan_logits
        self.config = config
        self.noiser = noiser
        self.ema_decay = float(ema_decay)
        self.r1_gamma = float(r1_gamma)
        self.encoder_decoder = HiddenEncoderDecoder(
            config, cover_channels=cover_channels)
        self.discriminator = HiddenDiscriminator(config)
        self.tx_enc_dec = optax.adam(lr)
        self.tx_discrim = optax.adam(lr if disc_lr is None else disc_lr)
        self._train_fn = None
        self._val_fn = None
        self._raw_train = None
        self._raw_val = None
        self._epoch_fn = None
        self._vepoch_fn = None

    # ------------------------------------------------------------------
    def init_state(self, rng, image, message) -> HiddenState:
        k1, k2 = jax.random.split(rng)
        ed = self.encoder_decoder.init(k1, image, message)
        d = self.discriminator.init(k2, image)
        return HiddenState(
            enc_dec=ed, discrim=d,
            opt_enc_dec=self.tx_enc_dec.init(ed["params"]),
            opt_discrim=self.tx_discrim.init(d["params"]),
            step=jnp.zeros((), jnp.int32),
            # a real copy: sharing buffers with params trips double-
            # donation in the donated train step
            ema=(jax.tree.map(jnp.copy, ed["params"])
                 if self.ema_decay else None))

    # ------------------------------------------------------------------
    def _forward(self, ed_vars, d_vars, image, message, key, train):
        kw = dict(mutable=["batch_stats"]) if train else {}
        out = self.encoder_decoder.apply(
            ed_vars, image, message, noiser=self.noiser, noiser_key=key,
            train=train, **kw)
        if train:
            (encoded, noised, decoded), ed_updates = out
        else:
            encoded, noised, decoded = out
            ed_updates = None
        return encoded, noised, decoded, ed_updates

    def _losses(self, cfg, image, message, encoded, decoded, g_logits):
        enc_mse = jnp.mean((encoded - image) ** 2)
        dec_mse = jnp.mean((decoded - message) ** 2)
        g_bce = self._gan(g_logits, 1.0)  # generator wants "cover"
        total = (cfg.encoder_loss * enc_mse + cfg.decoder_loss * dec_mse
                 + (cfg.adversarial_loss * g_bce
                    if cfg.use_discriminator else 0.0))
        bitwise = jnp.mean(jnp.abs(
            jnp.clip(jnp.round(decoded), 0, 1) - message))
        return total, enc_mse, dec_mse, g_bce, bitwise

    def _build_train(self):
        cfg = self.config
        tx_ed, tx_d = self.tx_enc_dec, self.tx_discrim

        def step(state: HiddenState, image, message, key):
            ed_stats = {k: v for k, v in state.enc_dec.items()
                        if k != "params"}
            d_stats = {k: v for k, v in state.discrim.items()
                       if k != "params"}

            def ed_loss_fn(ed_params):
                ed_vars = {"params": ed_params, **ed_stats}
                d_vars = {"params": state.discrim["params"], **d_stats}
                encoded, noised, decoded, ed_upd = self._forward(
                    ed_vars, d_vars, image, message, key, train=True)
                g_logits = self.discriminator.apply(d_vars, encoded)
                total, enc_mse, dec_mse, g_bce, bitwise = self._losses(
                    cfg, image, message, encoded, decoded, g_logits)
                return total, (encoded, noised, decoded, ed_upd,
                               enc_mse, dec_mse, g_bce, bitwise)

            (total, aux), ed_grads = jax.value_and_grad(
                ed_loss_fn, has_aux=True)(state.enc_dec["params"])
            encoded, noised, decoded, ed_upd, enc_mse, dec_mse, g_bce, \
                bitwise = aux

            def d_loss_fn(d_params):
                d_vars = {"params": d_params, **d_stats}
                kw = dict(mutable=["batch_stats"]) if d_stats else {}
                out_c = self.discriminator.apply(d_vars, image, train=True,
                                                 **kw)
                if d_stats:
                    logits_cover, d_upd = out_c
                else:
                    logits_cover, d_upd = out_c, None
                logits_enc = self.discriminator.apply(
                    {"params": d_params, **(d_upd or d_stats)},
                    jax.lax.stop_gradient(encoded))
                bce_cover = self._gan(logits_cover, 1.0)
                bce_enc = self._gan(logits_enc, 0.0)
                d_total = bce_cover + bce_enc
                if self.r1_gamma:
                    # R1: gamma/2 * E||grad_x D(x)||^2 on covers — keeps
                    # the discriminator from sharpening into the
                    # late-training oscillation regime
                    gx = jax.grad(lambda im: jnp.sum(
                        self.discriminator.apply(d_vars, im)))(image)
                    r1 = jnp.mean(jnp.sum(
                        jnp.square(gx.reshape(gx.shape[0], -1)), axis=1))
                    d_total = d_total + 0.5 * self.r1_gamma * r1
                return d_total, (bce_cover, bce_enc, d_upd)

            (d_total, (bce_cover, bce_enc, d_upd)), d_grads = \
                jax.value_and_grad(d_loss_fn, has_aux=True)(
                    state.discrim["params"])

            ed_updates, new_opt_ed = tx_ed.update(
                ed_grads, state.opt_enc_dec, state.enc_dec["params"])
            new_ed_params = optax.apply_updates(state.enc_dec["params"],
                                                ed_updates)
            d_updates, new_opt_d = tx_d.update(
                d_grads, state.opt_discrim, state.discrim["params"])
            new_d_params = optax.apply_updates(state.discrim["params"],
                                               d_updates)

            new_ema = state.ema
            if state.ema is not None:
                d_ema = self.ema_decay
                new_ema = jax.tree.map(
                    lambda e, p: d_ema * e + (1.0 - d_ema) * p,
                    state.ema, new_ed_params)
            new_state = HiddenState(
                enc_dec={"params": new_ed_params, **(ed_upd or ed_stats)},
                discrim={"params": new_d_params, **(d_upd or d_stats)},
                opt_enc_dec=new_opt_ed, opt_discrim=new_opt_d,
                step=state.step + 1, ema=new_ema)
            losses = {"loss": total, "encoder_mse": enc_mse,
                      "dec_mse": dec_mse, "bitwise-error": bitwise,
                      "adversarial_bce": g_bce,
                      "discr_cover_bce": bce_cover,
                      "discr_encod_bce": bce_enc}
            return new_state, losses, (encoded, noised, decoded)

        self._raw_train = step
        return jax.jit(step, donate_argnums=(0,))

    def _build_val(self):
        cfg = self.config

        def step(state: HiddenState, image, message, key):
            encoded, noised, decoded, _ = self._forward(
                state.enc_dec, state.discrim, image, message, key,
                train=False)
            g_logits = self.discriminator.apply(state.discrim, encoded)
            logits_cover = self.discriminator.apply(state.discrim, image)
            total, enc_mse, dec_mse, g_bce, bitwise = self._losses(
                cfg, image, message, encoded, decoded, g_logits)
            losses = {"loss": total, "encoder_mse": enc_mse,
                      "dec_mse": dec_mse, "bitwise-error": bitwise,
                      "adversarial_bce": g_bce,
                      "discr_cover_bce": self._gan(logits_cover, 1.0),
                      "discr_encod_bce": self._gan(g_logits, 0.0)}
            return losses, (encoded, noised, decoded)

        self._raw_val = step
        return jax.jit(step)

    # ------------------------------------------------------------------
    # Device-resident epochs: the per-batch train_on_batch API pays one
    # Python dispatch + one scalar-fetch round trip per batch, which on a
    # remote-tunnel backend dwarfs the device step. These scan a whole
    # epoch on chip and return stacked per-step losses in one fetch.
    def run_epoch(self, state: HiddenState, covers, idx, msgs, key):
        """covers (N,H,W,C) device-resident; idx (steps,B) i32;
        msgs (steps,B,h,w,1). Returns (new_state, losses dict of
        (steps,) arrays)."""
        if self._epoch_fn is None:
            if self._raw_train is None:
                self._train_fn = self._build_train()
            raw = self._raw_train

            def epoch(state, covers, idx, msgs, key):
                keys = jax.random.split(key, idx.shape[0])

                def body(st, xs):
                    ix, msg, k = xs
                    st, losses, _ = raw(st, jnp.take(covers, ix, axis=0),
                                        msg, k)
                    return st, losses

                return jax.lax.scan(body, state, (idx, msgs, keys))

            self._epoch_fn = jax.jit(epoch, donate_argnums=(0,))
        return self._epoch_fn(state, covers, jnp.asarray(idx),
                              jnp.asarray(msgs), key)

    def run_val_epoch(self, state: HiddenState, covers, idx, msgs, key):
        """Validation sweep as one device program; state untouched."""
        if self._vepoch_fn is None:
            if self._raw_val is None:
                self._val_fn = self._build_val()
            raw = self._raw_val

            def vepoch(state, covers, idx, msgs, key):
                keys = jax.random.split(key, idx.shape[0])

                def body(carry, xs):
                    ix, msg, k = xs
                    losses, _ = raw(state, jnp.take(covers, ix, axis=0),
                                    msg, k)
                    return carry, losses

                _, losses = jax.lax.scan(body, 0, (idx, msgs, keys))
                return losses

            self._vepoch_fn = jax.jit(vepoch)
        return self._vepoch_fn(state, covers, jnp.asarray(idx),
                               jnp.asarray(msgs), key)

    def train_on_batch(self, state: HiddenState, batch, key=None):
        """batch = [images NHWC, messages NHWC]."""
        if self._train_fn is None:
            self._train_fn = self._build_train()
        image, message = (jnp.asarray(b) for b in batch)
        key = key if key is not None else jax.random.key(
            int(state.step))
        new_state, losses, tensors = self._train_fn(state, image, message,
                                                    key)
        return new_state, {k: float(v) for k, v in losses.items()}, tensors

    def validate_on_batch(self, state: HiddenState, batch, key=None):
        if self._val_fn is None:
            self._val_fn = self._build_val()
        image, message = (jnp.asarray(b) for b in batch)
        key = key if key is not None else jax.random.key(0)
        losses, tensors = self._val_fn(state, image, message, key)
        return {k: float(v) for k, v in losses.items()}, tensors

    # ------------------------------------------------------------------
    def ema_state(self, state: HiddenState) -> HiddenState:
        """View of ``state`` with the EMA weights as the enc/dec params
        (what validation/shipping uses when ema_decay is on)."""
        if state.ema is None:
            return state
        stats = {k: v for k, v in state.enc_dec.items() if k != "params"}
        return dataclasses.replace(
            state, enc_dec={"params": state.ema, **stats})

    def checkpoint_payload(self, state: HiddenState, epoch: int) -> dict:
        """The reference's checkpoint dict keys (hidden/utils.py:84-90),
        plus ``enc-dec-ema`` when the EMA stabilizer is on."""
        to_np = lambda t: jax.tree.map(np.asarray, t)
        out = {"enc-dec-model": to_np(state.enc_dec),
               "enc-dec-optim": to_np(state.opt_enc_dec),
               "discrim-model": to_np(state.discrim),
               "discrim-optim": to_np(state.opt_discrim),
               "epoch": epoch}
        if state.ema is not None:
            out["enc-dec-ema"] = to_np(state.ema)
        return out

    def state_from_checkpoint(self, payload: dict) -> HiddenState:
        return HiddenState(
            enc_dec=payload["enc-dec-model"],
            discrim=payload["discrim-model"],
            opt_enc_dec=payload["enc-dec-optim"],
            opt_discrim=payload["discrim-optim"],
            step=jnp.zeros((), jnp.int32),
            ema=payload.get("enc-dec-ema"))
