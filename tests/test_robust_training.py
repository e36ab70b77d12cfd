"""In-graph attack-conditioned training (the TPU-native upgrade: the
reference attacks only at eval time; here one random differentiable
attack per step sits on the training graph)."""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.config import TrainConfig, UformerConfig
from image_in_speech_watermarking_tpu.train import Trainer

CFG = UformerConfig(img_size=64, embed_dim=8, depths=(1,) * 9,
                    num_heads=(1, 2, 4, 8, 8, 8, 8, 4, 2), modulator=True,
                    n_fft=127, hop_length=31)


def test_robust_step_runs_and_flows():
    model = models.UformerAudio(CFG)
    cfg = TrainConfig(batch_size=2, nepoch=1)
    tr = Trainer(model, cfg, steps_per_epoch=1,
                 robust_attacks=("awgn-15", "requantization"),
                 robust_mode="aux")
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    state = tr.init_state(x, msg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = tr.train_step(state, x, msg, jax.random.key(1))
    assert "wm_attacked" in metrics
    assert np.isfinite(float(metrics["wm_attacked"]))
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p0,
                         jax.tree.map(np.asarray, state.params))
    assert max(jax.tree.leaves(moved)) > 0
    # different steps pick different attacks -> different robust losses
    vals = set()
    for i in range(3):
        state, m = tr.train_step(state, x, msg, jax.random.key(i + 2))
        vals.add(round(float(m["wm_attacked"]), 8))
    assert len(vals) > 1


def test_channel_mode_runs_and_is_smaller():
    """robust_mode="channel" (round 3): the extractor reads the attacked
    clip instead of the clean one — HiDDeN noiser topology. The program
    must stay near the baseline step's size (the aux mode's duplicated
    extractor crashed the remote TPU worker's compiler on the flagship)."""
    model = models.UformerAudio(CFG)
    cfg = TrainConfig(batch_size=2, nepoch=1)
    bank = ("closed_loop", "awgn-15", "time_shift-100", "time_warp-10")
    tr = Trainer(model, cfg, steps_per_epoch=1, robust_attacks=bank,
                 robust_mode="channel")
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    state = tr.init_state(x, msg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = tr.train_step(state, x, msg, jax.random.key(1))
    assert "attack_idx" in metrics and "wm_attacked" not in metrics
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p0,
                         jax.tree.map(np.asarray, state.params))
    assert max(jax.tree.leaves(moved)) > 0
    # different steps sample different attacks
    idxs = set()
    for i in range(4):
        state, m = tr.train_step(state, x, msg, jax.random.key(i + 2))
        idxs.add(int(m["attack_idx"]))
    assert len(idxs) > 1

    # program-size: channel mode's only addition over baseline is the
    # attack channel itself (ISTFT -> 4-way switch -> STFT, measured
    # +17%); aux duplicates the whole extractor fwd+bwd on top of that
    # (measured +34% — the program that crashed the TPU worker).
    base = Trainer(model, cfg, steps_per_epoch=1)
    aux = Trainer(model, cfg, steps_per_epoch=1, robust_attacks=bank,
                  robust_mode="aux")
    sizes = {}
    for name, t in [("base", base), ("channel", tr), ("aux", aux)]:
        fn = t._build_step()
        sizes[name] = len(fn.lower(state, x, msg,
                                   jax.random.key(0)).as_text())
    assert sizes["channel"] < sizes["base"] * 1.25, sizes
    assert sizes["aux"] > sizes["channel"] * 1.1, sizes
