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
                 robust_attacks=("awgn-15", "requantization"))
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
