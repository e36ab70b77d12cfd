"""Training loops: one jitted, mesh-sharded train step per model family.

Parity targets:
  UformerAudio loss (4 terms)   uformerWM/audio_uformer_stft.py:463-482
  AdamW(2e-4, wd 0.02)          audio_uformer_stft.py:252-257
  warmup(3ep)+cosine(1e-6)      audio_uformer_stft.py:347-356
  ModelA loss (2 terms)         uformerWM/train_modelA.py (audio MSE +
                                wm MSE), early stop patience 5
  best-loss checkpointing       audio_uformer_stft.py:545-549

TPU-first design: the whole step (forward incl. the in-graph ISTFT->STFT
channel sim, loss, backward, AdamW update) is ONE jit program laid out
over a Mesh — batch sharded on the 'data' axis, parameters optionally
FSDP-sharded on 'model'. XLA inserts the grad reduce-scatter/all-gathers.
The reference's AMP/NativeScaler is unnecessary: bf16 matmuls need no loss
scaling; dtype policy is a config knob.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from image_in_speech_watermarking_tpu.config import (LossWeights,
                                                     TrainConfig)
from image_in_speech_watermarking_tpu.parallel import (batch_sharding,
                                                       fsdp_param_specs,
                                                       make_mesh)
from image_in_speech_watermarking_tpu.train import schedulers


import flax.struct


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    batch_stats: Any = None  # for BatchNorm models (ModelA, HiDDeN)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int,
                   freeze: tuple = ()):
    """AdamW + warmup-cosine (audio_uformer_stft.py:252-257,347-356).

    ``freeze``: path-substring patterns; matching parameters get no
    update (and no weight decay) — the reference's freeze/unfreeze
    (uformerWM/utils/model_utils.py:10-25) as an optax mask."""
    if cfg.warmup:
        sched = schedulers.warmup_cosine(
            cfg.lr_initial, cfg.warmup_epochs, cfg.nepoch, steps_per_epoch,
            cfg.lr_min)
    else:
        sched = schedulers.step_lr(cfg.lr_initial, cfg.step_lr_step,
                                   cfg.step_lr_gamma, steps_per_epoch)
    tx = optax.adamw(sched, b1=cfg.beta1, b2=cfg.beta2, eps=cfg.eps,
                     weight_decay=cfg.weight_decay)
    # Skip non-finite update steps instead of poisoning the params —
    # the reference's AMP NativeScaler semantics (timm skips the
    # optimizer step when the unscaled grads are inf/nan,
    # audio_uformer_stft.py:372,538). A single pathological robust-bank
    # batch (observed: a vocoder-branch zero-bin |z| VJP pole) NaN'd an
    # entire fine-tune before this guard.
    tx = optax.apply_if_finite(tx, max_consecutive_errors=50)
    if freeze:
        def label(params):
            def one(path, _):
                name = "/".join(str(getattr(k, "key", k)) for k in path)
                return "frozen" if any(s in name for s in freeze) \
                    else "train"
            return jax.tree_util.tree_map_with_path(one, params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label)
    return tx, sched


def uformer_loss(outputs, stft_in: jnp.ndarray, message: jnp.ndarray,
                 weights: LossWeights = LossWeights()):
    """L = MSE(audio, stft) + MSE(wm_pred, msg) + MSE(wm_decode, msg)
    + MSE(||noise||/B, 1)   (audio_uformer_stft.py:463-482)."""
    audio, noise, wm_pred, wm_decode = outputs
    b = noise.shape[0]
    loss1 = jnp.mean((audio - stft_in) ** 2)
    noise_norm = jnp.linalg.norm(noise.reshape(-1)) / b
    loss4 = (noise_norm - 1.0) ** 2
    loss2 = jnp.mean((wm_pred - message) ** 2)
    loss3 = jnp.mean((wm_decode - message) ** 2)
    total = (weights.audio * loss1 + weights.wm_pred * loss2
             + weights.wm_decode * loss3 + weights.noise_norm * loss4)
    return total, {"loss": total, "audio_mse": loss1, "wm_gen": loss2,
                   "wm_decode": loss3, "noise": loss4}


def model_a_loss(outputs, stft_in, message):
    """2-term ModelA loss (train_modelA.py): audio MSE + wm MSE."""
    encoded, extracted = outputs
    l1 = jnp.mean((encoded - stft_in) ** 2)
    l2 = jnp.mean((extracted - message) ** 2)
    return l1 + l2, {"loss": l1 + l2, "audio_mse": l1, "wm_decode": l2}


class Trainer:
    """jit/mesh-compiled trainer for the spectrogram watermarkers
    (UformerAudio and ModelA)."""

    def __init__(self, model, cfg: TrainConfig, steps_per_epoch: int = 100,
                 mesh=None, loss_weights: LossWeights = LossWeights(),
                 robust_attacks: tuple = (),
                 robust_weight: float = 1.0,
                 robust_mode: str = "channel",
                 robust_seam: bool = False,
                 freeze: tuple = ()):
        """``robust_attacks``: optional in-graph attack-conditioned
        training (a TPU-native upgrade over the reference, which attacks
        only at eval time, SURVEY §2.5): per step one random attack from
        the bank is applied to the reconstructed watermarked waveform and
        the extractor must still decode it; every attack in
        attacks/waveform.py is differentiable and shape-static, so this
        rides the same jit program. Example: ("closed_loop", "awgn-15",
        "amplitude_scaling-0.8", "requantization", "aac").

        ``robust_mode`` picks how the attack enters the graph:
          - "channel" (default): HiDDeN-style — the extractor reads the
            attacked clip INSTEAD of the clean one (the noiser between
            encode and decode, hidden/noise_layers/noiser.py:29-31).
            Program size stays at the baseline step's (one embed + one
            extract fwd/bwd); include "closed_loop" in the bank to keep
            sampling the clean channel.
          - "aux": the round-2 formulation — an extra attacked-decode
            loss term on top of the full clean forward. Trains the clean
            path every step but DOUBLES the extractor in the program
            (+34% StableHLO measured), which crashed the remote TPU
            worker's compiler on the flagship."""
        # Honor cfg.dtype: rebuild the model with the matching compute
        # dtype (bf16 matmuls/convs on the MXU, f32 norms/softmax/DFT).
        # The reference's AMP intent (audio_uformer_stft.py:372,538); no
        # loss scaling needed on TPU.
        if (cfg.dtype != "float32" and hasattr(model, "cfg")
                and hasattr(model.cfg, "compute_dtype")
                and model.cfg.compute_dtype != cfg.dtype):
            model = dataclasses.replace(
                model, cfg=dataclasses.replace(
                    model.cfg, compute_dtype=cfg.dtype))
        self.model = model
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.mesh_shape, cfg.mesh_axes)
        self.tx, self.schedule = make_optimizer(cfg, steps_per_epoch,
                                                freeze=tuple(freeze))
        self.loss_weights = loss_weights
        self.is_model_a = type(model).__name__ == "ModelA"
        # "spec*w" entries oversample a branch (w = relative draw weight)
        # WITHOUT duplicating it in the lax.switch — duplicated branches
        # compile twice and the remote worker has a hard program-size
        # ceiling (ROADMAP #8). E.g. "vocoder_roundtrip-0.9*3".
        specs, weights = [], []
        for s in robust_attacks:
            if "*" in s:
                spec, _, w = s.rpartition("*")
                specs.append(spec)
                weights.append(float(w))
            else:
                specs.append(s)
                weights.append(1.0)
        self.robust_attacks = tuple(specs)
        self.robust_probs = (np.asarray(weights) / np.sum(weights)
                             if specs else None)
        self.robust_weight = robust_weight
        if robust_mode not in ("channel", "aux"):
            raise ValueError(f"robust_mode {robust_mode!r}")
        self.robust_mode = robust_mode
        self.robust_seam = robust_seam
        self._step_fn = None
        self._raw_step = None
        self._epoch_fn = None
        self._fig_fn = None

    def _attack_channel(self, y, rng):
        """ISTFT the watermarked clip, apply ONE random attack from the
        bank (lax.switch over the differentiable, shape-static branches),
        re-STFT. Returns the attacked spectrogram.

        ``robust_seam``: the eval chain embeds per clip, concatenates the
        clip spectrograms, and runs ONE whole-utterance ISTFT — so at
        extraction time each clip's edges carry overlap-add interference
        from the NEIGHBORING clip's watermark, and a whole-wave vocoder
        attack walks ACROSS the seam. Per-clip channel training never
        shows the extractor either effect (the round-4 decomposition
        localized the remaining 0.022 oracle residual to seam clips
        3/5/8, docs/round4_demo/README.md §2f). With seam pairing on,
        consecutive batch elements are concatenated along the frame axis,
        ISTFT'd as one continuous 2-clip wave, attacked jointly, re-
        STFT'd, and split back — every training clip then sees a real
        seam on one side."""
        from image_in_speech_watermarking_tpu.attacks.waveform import (
            get_attack)
        from image_in_speech_watermarking_tpu.dsp.stft import (istft_ri,
                                                               stft_ri)

        mcfg = self.model.cfg
        paired = self.robust_seam and y.shape[0] % 2 == 0
        if paired:
            b, bins, frames, ch = y.shape
            y = (y.reshape(b // 2, 2, bins, frames, ch)
                 .transpose(0, 2, 1, 3, 4)
                 .reshape(b // 2, bins, 2 * frames, ch))
        wave = istft_ri(y, n_fft=mcfg.n_fft, hop_length=mcfg.hop_length)
        kpick, kapply = jax.random.split(rng)
        idx = jax.random.choice(kpick, len(self.robust_attacks),
                                p=jnp.asarray(self.robust_probs))
        n = wave.shape[-1]

        def fixlen(w):
            # length-changing attacks (time/pitch scaling, resampling
            # ratios) must stay shape-static inside lax.switch: crop or
            # zero-pad back to the input length (the eval chain instead
            # re-chunks on host, eval/pipeline.py)
            w = w[..., :n]
            pad = n - w.shape[-1]
            if pad:
                w = jnp.pad(w, [(0, 0)] * (w.ndim - 1) + [(0, pad)])
            return w

        branches = [
            (lambda fn: lambda w: fixlen(fn(kapply, w)))(get_attack(spec))
            for spec in self.robust_attacks]
        wave_att = jax.lax.switch(idx, branches, wave)
        spec_att = stft_ri(wave_att, n_fft=mcfg.n_fft,
                           hop_length=mcfg.hop_length)
        if paired:
            spec_att = spec_att[..., :2 * frames, :]
            spec_att = (spec_att.reshape(b // 2, bins, 2, frames, ch)
                        .transpose(0, 2, 1, 3, 4)
                        .reshape(b, bins, frames, ch))
        return spec_att, idx

    def _robust_decode_loss(self, variables, batch, noise, message, rng):
        """robust_mode="aux": random-attack the watermarked waveform
        in-graph and penalize extraction error as an EXTRA loss term."""
        spec_att, _ = self._attack_channel(batch + noise, rng)
        wm_att = self.model.apply(variables, spec_att,
                                  method=self.model.wm_decode)
        return jnp.mean((wm_att - message) ** 2)

    def _channel_forward(self, variables, batch, message, rngs):
        """robust_mode="channel": the HiDDeN noiser topology — embed,
        push the clip through ONE random in-graph attack, and extract
        from the ATTACKED clip (the reference extractor reads the clean
        clip, model.py:2508). Same program size as the baseline step:
        one embed + one extract fwd/bwd."""
        out = self.model.apply(variables, batch, message,
                               deterministic=False, rngs=rngs,
                               method=self.model.embed)
        y, noise, wm_pred = out
        stft_new = self.model.apply(variables, y,
                                    method=self.model.channel_sim)
        spec_att, idx = self._attack_channel(y, rngs["attack"])
        wm = self.model.apply(variables, spec_att, deterministic=False,
                              rngs=rngs, method=self.model.wm_decode)
        return (stft_new, noise, wm_pred, wm), idx

    # -------------------- init --------------------

    def init_state(self, sample_batch, sample_message) -> TrainState:
        rng = jax.random.key(self.cfg.seed)
        variables = jax.jit(self.model.init)(rng, sample_batch,
                                             sample_message)
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        state = TrainState(params=params,
                           opt_state=self.tx.init(params),
                           step=jnp.zeros((), jnp.int32),
                           batch_stats=batch_stats)
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        mesh = self.mesh
        if mesh.size == 1:
            # keep buffers free of NamedSharding commitments — see the
            # single-device note in _build_step
            return state
        if "model" in mesh.axis_names and mesh.shape["model"] > 1:
            pspecs = fsdp_param_specs(state.params, mesh)
        else:
            pspecs = jax.tree.map(lambda _: P(), state.params)
        put = lambda tree, specs: jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)
        params = put(state.params, pspecs)
        opt_state = jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P())) if np.ndim(x) == 0 else x,
            state.opt_state)
        # opt_state moments mirror param shapes; let jit lay them out
        return dataclasses.replace(state, params=params,
                                   opt_state=opt_state)

    # -------------------- the step --------------------

    def _loss_fn(self, params, batch_stats, batch, message, rngs):
        variables = {"params": params}
        has_stats = batch_stats is not None
        if has_stats:
            variables["batch_stats"] = batch_stats
        kw = dict(mutable=["batch_stats"]) if has_stats else {}
        if (self.robust_attacks and not self.is_model_a
                and self.robust_mode == "channel"):
            if has_stats:
                raise NotImplementedError(
                    "channel-mode robust training with batch_stats")
            out, idx = self._channel_forward(variables, batch, message,
                                             rngs)
            loss, metrics = uformer_loss(out, batch, message,
                                         self.loss_weights)
            metrics = {**metrics, "attack_idx": idx.astype(jnp.float32)}
            return loss, (metrics, None)
        if self.is_model_a:
            out = self.model.apply(variables, batch, message, train=True,
                                   **kw)
        else:
            out = self.model.apply(variables, batch, message,
                                   deterministic=False, rngs=rngs, **kw)
        if has_stats:
            out, updates = out
            new_stats = updates["batch_stats"]
        else:
            new_stats = None
        if self.is_model_a:
            loss, metrics = model_a_loss(out, batch, message)
        else:
            loss, metrics = uformer_loss(out, batch, message,
                                         self.loss_weights)
        if self.robust_attacks and not self.is_model_a:
            rl = self._robust_decode_loss(
                {"params": params}, batch, out[1], message,
                rngs["attack"])
            loss = loss + self.robust_weight * rl
            metrics = {**metrics, "loss": loss, "wm_attacked": rl}
        return loss, (metrics, new_stats)

    def _build_step(self):
        tx = self.tx

        def step(state: TrainState, batch, message, rng):
            folded = jax.random.fold_in(rng, state.step)
            k1, k2 = jax.random.split(folded)
            rngs = {"droppath": k1, "attack": k2}
            grad_fn = jax.value_and_grad(self._loss_fn, has_aux=True)
            (loss, (metrics, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, batch, message, rngs)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            return TrainState(params=new_params, opt_state=new_opt,
                              step=state.step + 1,
                              batch_stats=new_stats), metrics

        self._raw_step = step
        if self.mesh.size > 1:
            data_shard = batch_sharding(self.mesh)
            self._step_fn = jax.jit(
                step,
                in_shardings=(None, data_shard, data_shard, None),
                donate_argnums=(0,))
        else:
            # Single device: plain jit. Passing NamedSharding in_shardings
            # to a 1-device mesh routes every call through a pathological
            # resharding path on the remote-TPU backend (measured 22.5 s
            # vs 29 ms per step for the identical program — the round-1
            # "11 s/step" mystery).
            self._step_fn = jax.jit(step, donate_argnums=(0,))
        return self._step_fn

    def _build_epoch_fn(self):
        """Whole-epoch ``lax.scan`` over train steps, jitted once.

        On the remote-TPU backend every per-step Python dispatch and every
        scalar device->host fetch pays a tunnel round trip (measured:
        ~12 ms device step, but ~70 ms dispatch backpressure and ~1.5 s
        per metrics fetch — the host loop, not the TPU, was the training
        bottleneck). Scanning the epoch on device turns 300+ dispatches +
        30+ fetches into ONE dispatch + ONE stacked-metrics fetch per
        epoch. The corpus lives in HBM; per-step batches are a gather on
        the shuffled index matrix computed on host per epoch."""
        if self._raw_step is None:
            self._build_step()
        raw = self._raw_step

        def epoch(state, clips, idx, msgs, rng):
            # idx (steps, B) i32; msgs (steps, B, 32, 32, 1)
            # per-step key = fold_in(epoch_rng, step) — the same
            # derivation the host loop uses, so scan and loop paths (and
            # therefore --resume across them) are bit-identical
            def body(st, xs):
                i, ix, msg = xs
                k = jax.random.fold_in(rng, i)
                return raw(st, jnp.take(clips, ix, axis=0), msg, k)

            steps = jnp.arange(idx.shape[0], dtype=jnp.uint32)
            return jax.lax.scan(body, state, (steps, idx, msgs))

        if self.mesh.size > 1:
            # sharded device-resident epochs: the corpus is pinned
            # replicated, the per-step index matrix and message stream
            # are dp-sharded on the batch dim, so each device gathers
            # only its batch shard locally; XLA inserts the grad
            # collectives exactly as in the per-step path
            mesh = self.mesh
            dsh = NamedSharding(mesh, P(None, "data"))
            self._epoch_fn = jax.jit(
                epoch,
                in_shardings=(None, NamedSharding(mesh, P()), dsh, dsh,
                              None),
                donate_argnums=(0,))
        else:
            self._epoch_fn = jax.jit(epoch, donate_argnums=(0,))
        return self._epoch_fn

    def train_step(self, state: TrainState, batch, message,
                   rng) -> tuple[TrainState, dict]:
        if self._step_fn is None:
            self._build_step()
        return self._step_fn(state, jnp.asarray(batch),
                             jnp.asarray(message), rng)

    # -------------------- the loop --------------------

    def _restore_state(self, path: str, template: TrainState,
                       params_only: bool = False) -> tuple[TrainState, int]:
        """Pour a checkpoint back into the state template. Returns
        (state, next_epoch)."""
        from image_in_speech_watermarking_tpu.train import checkpoint as ckpt

        # warn if the checkpoint's model-config snapshot disagrees with
        # the model being restored into (same shapes, different function
        # — e.g. stft_residual; advisor r2 finding)
        ckpt.check_model_cfg(path, getattr(self.model, 'cfg', None))
        like = {"params": template.params, "step": 0, "epoch": 0}
        if not params_only:
            like["opt_state"] = template.opt_state
        if template.batch_stats is not None:
            like["batch_stats"] = template.batch_stats
        raw = ckpt.restore(path)

        def fit(tpl, leaf):
            """Zero-pad a stored conv kernel whose INPUT-channel dim
            (-2) grew in the template — e.g. pouring a 2-channel
            extractor checkpoint into an extractor_mag=True model: the
            new channel's kernel slice starts at zero, so the restored
            function is exactly the stored one. Only for fine-tune
            (params_only) pours; any other shape mismatch is an error."""
            leaf = np.asarray(leaf)
            ts = tuple(np.shape(tpl))
            if leaf.shape == ts:
                return leaf
            if (params_only and leaf.ndim == len(ts) and leaf.ndim >= 2
                    and leaf.shape[-2] < ts[-2]
                    and leaf.shape[:-2] + leaf.shape[-1:]
                    == ts[:-2] + ts[-1:]):
                pad = [(0, 0)] * leaf.ndim
                pad[-2] = (0, ts[-2] - leaf.shape[-2])
                return np.pad(leaf, pad)
            raise ValueError(
                f"checkpoint leaf shape {leaf.shape} does not fit "
                f"template {ts}")

        # pour stored leaves field-by-field into the template's structure
        # BY KEY PATH (optax namedtuples don't survive serialization, and
        # positional zip misorders any namedtuple whose field order isn't
        # alphabetical — e.g. ApplyIfFiniteState; see ckpt.pour_like)
        restored = {}
        for k in like:
            sub = raw[k] if k in raw else like[k]
            restored[k] = ckpt.pour_like(like[k], sub, fit)
        if params_only:
            state = dataclasses.replace(
                template, params=restored["params"],
                batch_stats=restored.get("batch_stats",
                                         template.batch_stats))
            return self.shard_state(state), 1
        state = TrainState(
            params=restored["params"], opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
            batch_stats=restored.get("batch_stats"))
        return self.shard_state(state), int(restored["epoch"]) + 1

    def _dump_figure(self, state: TrainState, fig_pair, result_dir: str,
                     epoch: int):
        """message / wm_pred / wm_decode grid for one batch
        (audio_uformer_stft.py:486-536)."""
        from image_in_speech_watermarking_tpu.eval.artifacts import (
            save_training_figure)

        batch, message = (jnp.asarray(x) for x in fig_pair)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        # jit: an eager apply dispatches each op through the (remote)
        # device tunnel one at a time — observed to stall an epoch for
        # >15 min where the jitted forward takes ~100 ms
        if self._fig_fn is None:
            self._fig_fn = jax.jit(
                lambda v, b, m: self.model.apply(v, b, m))
        if self.is_model_a:
            _, extracted = self._fig_fn(variables, batch, message)
            wm_pred = wm_decode = extracted
        else:
            _, _, wm_pred, wm_decode = self._fig_fn(variables, batch,
                                                    message)
        figdir = os.path.join(result_dir, "figures")
        os.makedirs(figdir, exist_ok=True)
        save_training_figure(
            os.path.join(figdir, f"epoch{epoch:04d}.png"),
            np.asarray(message), np.asarray(wm_pred),
            np.asarray(wm_decode))

    def fit(self, dataset, wm_stream, epochs: Optional[int] = None,
            result_dir: Optional[str] = None,
            log_every: int = 10,
            callback: Optional[Callable] = None,
            early_stop_patience: Optional[int] = None,
            resume_from: Optional[str] = None,
            init_from: Optional[str] = None,
            fig_every: int = 0,
            save_every: int = 1):
        """Epoch loop with best-loss checkpointing
        (audio_uformer_stft.py:418-553) and jsonl metrics (replacing
        exp_loss.txt). ``early_stop_patience`` mirrors the ModelA
        trainer's stop after N non-improving epochs
        (train_modelA.py:511-514; patience 5 in the reference).

        ``resume_from``: checkpoint dir — restores params + optimizer
        state + epoch and continues exactly (the schedule count lives in
        opt_state, so lr replay matches train_denoise.py:103-122's resume
        semantics). Data order, watermark stream and dropout rngs are
        derived per-epoch from cfg.seed, so a killed-and-resumed run
        reproduces the uninterrupted loss curve.

        ``init_from``: checkpoint dir — loads params (+ batch_stats) only
        and starts a FRESH optimizer/schedule: the reference's
        fine_tune() entry (audio_uformer_stft.py). This is the safe path
        for continued training with changed data/loss: replaying stale
        AdamW second moments against a shifted objective diverges
        (observed in round 1).

        ``wm_stream`` may be an iterator (legacy) or a callable
        ``epoch -> iterator`` — the callable form makes resume exact.

        ``fig_every``: every N epochs save a message / wm_pred / wm_decode
        image grid to <result_dir>/figures (the reference dumps these
        every 10 steps, audio_uformer_stft.py:486-536).
        """
        from image_in_speech_watermarking_tpu.train import checkpoint as ckpt

        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.nepoch
        wm_factory = wm_stream if callable(wm_stream) else None
        stream = None if wm_factory else wm_stream
        sample = next(dataset.batches(cfg.batch_size, seed=0))
        msg0 = next(wm_factory(0)) if wm_factory else next(stream)
        state = self.init_state(jnp.asarray(sample), jnp.asarray(msg0))
        start_epoch = 1
        if resume_from:
            state, start_epoch = self._restore_state(resume_from, state)
        elif init_from:
            state, _ = self._restore_state(init_from, state,
                                           params_only=True)

        best = None
        best_epoch = start_epoch
        last_saved = start_epoch - save_every  # first best saves at once
        log_f = None
        if result_dir:
            os.makedirs(result_dir, exist_ok=True)
            # config snapshot (exp_config.txt parity,
            # audio_uformer_stft.py:380-381)
            with open(os.path.join(result_dir, "exp_config.json"), "w") as f:
                snap = dataclasses.asdict(cfg)
                snap["robust_attacks"] = list(self.robust_attacks)
                if self.robust_probs is not None:
                    snap["robust_probs"] = [round(float(p), 6)
                                            for p in self.robust_probs]
                snap["robust_mode"] = self.robust_mode
                json.dump(snap, f, indent=2, default=str)
            log_f = open(os.path.join(result_dir, "exp_loss.jsonl"), "a")

        # Device-resident epochs: scan the whole epoch on chip (see
        # _build_epoch_fn — the per-step host loop was tunnel-latency-
        # bound). The corpus is pinned in HBM once (replicated on a
        # multi-device mesh; batch gathers are dp-sharded); each epoch is
        # ONE dispatch + ONE stacked-metrics fetch.
        use_scan = (cfg.epoch_scan
                    and getattr(dataset, "kind", "")
                    in ("train", "train255")
                    and getattr(dataset, "clips", None) is not None)
        clips_dev = None
        if use_scan:
            if self.mesh.size > 1:
                clips_dev = jax.device_put(
                    np.asarray(dataset.clips),
                    NamedSharding(self.mesh, P()))
            else:
                clips_dev = jax.device_put(np.asarray(dataset.clips))
            if self._epoch_fn is None:
                self._build_epoch_fn()

        for epoch in range(start_epoch, epochs + 1):
            epoch_loss, t0 = 0.0, time.time()
            rng = jax.random.fold_in(jax.random.key(cfg.seed), epoch)
            wm_iter = wm_factory(epoch) if wm_factory else None
            fig_pair = None
            n_sync = 0
            if use_scan:
                n = len(dataset.clips)
                steps = max(n // cfg.batch_size, 1)
                # same shuffle stream as dataset.batches(seed=(seed,
                # epoch)); cfg.seed folded in so --seed changes the
                # batch order too, not just init/dropout
                perm = np.random.default_rng(
                    (cfg.seed, epoch)).permutation(n)
                idx = perm[: steps * cfg.batch_size].astype(np.int32)
                idx = idx.reshape(steps, cfg.batch_size)
                msgs = np.stack([
                    np.asarray(next(wm_iter) if wm_iter else next(stream))
                    for _ in range(steps)])
                fig_pair = (dataset.clips[idx[0]], msgs[0])
                state, mstack = self._epoch_fn(
                    state, clips_dev, jnp.asarray(idx), jnp.asarray(msgs),
                    rng)
                vals_all = jax.device_get(mstack)   # one host fetch
                # nanmean: a skipped non-finite step (apply_if_finite)
                # logs a NaN loss but must not poison the epoch mean
                # that drives best-checkpoint selection
                epoch_loss = float(np.nanmean(vals_all["loss"]))
                n_sync = 1
                if log_f:
                    for i in range(0, steps, log_every):
                        log_f.write(json.dumps(
                            {"epoch": epoch, "step": i,
                             **{k: float(v[i])
                                for k, v in vals_all.items()}}) + "\n")
            else:
                for i, batch in enumerate(
                        dataset.batches(cfg.batch_size,
                                        seed=(cfg.seed, epoch))):
                    message = next(wm_iter) if wm_iter else next(stream)
                    if i == 0:
                        fig_pair = (batch, message)
                    sub = jax.random.fold_in(rng, i)
                    state, metrics = self.train_step(state, batch, message,
                                                     sub)
                    # Fetch scalars only every log_every steps (one
                    # device_get, not per-key float(): each separate
                    # scalar fetch pays a tunnel round trip). Sampled
                    # epoch loss drives best-ckpt selection + early stop.
                    if i % log_every == 0:
                        vals = {k: float(v) for k, v in
                                jax.device_get(metrics).items()}
                        if np.isfinite(vals["loss"]):   # skipped step
                            epoch_loss += vals["loss"]
                            n_sync += 1
                        if log_f:
                            log_f.write(json.dumps(
                                {"epoch": epoch, "step": i, **vals}) + "\n")
                epoch_loss /= max(n_sync, 1)
            if log_f:
                log_f.flush()
            if result_dir and fig_every and epoch % fig_every == 0 \
                    and fig_pair is not None:
                self._dump_figure(state, fig_pair, result_dir, epoch)
            if callback:
                callback(epoch, state, epoch_loss)
            if best is None or epoch_loss < best:
                best = epoch_loss
                best_epoch = epoch
                # save_every throttles checkpoint writes (a full-state
                # orbax save round-trips ~800 MB off-device)
                if result_dir and (epoch - last_saved >= save_every
                                   or epoch == epochs):
                    # async: snapshot to host now, write in background
                    ckpt.save_async(os.path.join(result_dir, "model"),
                                    state, epoch=epoch)
                    ckpt.save_model_cfg(os.path.join(result_dir, "model"),
                                        getattr(self.model, 'cfg', None))
                    last_saved = epoch
            elif early_stop_patience is not None \
                    and epoch - best_epoch >= early_stop_patience:
                break  # early stop (train_modelA.py:511-514)
        if log_f:
            log_f.close()
        ckpt.wait_for_saves()
        return state
