"""WMNetCNN family contracts + cross-modulator + spectral loss + tb logger."""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import models
from image_in_speech_watermarking_tpu.models.layers import (
    LeWinTransformerBlock)
from image_in_speech_watermarking_tpu.models.wm_network import spectral_loss


def test_wmnet_family_contracts():
    """All three share ModelA's (encoded, extracted) 2-tuple convention."""
    wm = jnp.zeros((2, 32, 32, 1))
    for arch, chans in (("WMNetCNN", 2), ("WMNetCNNTF", 2),
                        ("WMNetCNNAudio", 1)):
        m = models.get_arch(arch)
        x = jax.random.normal(jax.random.key(0), (2, 128, 128, chans)) * 0.1
        p = m.init(jax.random.key(1), x, wm)
        encoded, extracted = m.apply(p, x, wm)
        assert encoded.shape == x.shape, arch
        assert extracted.shape == (2, 32, 32, 1), arch
        dec = m.apply(p, encoded, method="decode")
        assert dec.shape == (2, 32, 32, 1), arch


def test_wmnet_tf_preserves_phase():
    """WMNetCNNTF embeds into magnitude; phase angle is preserved."""
    m = models.get_arch("WMNetCNNTF")
    x = jax.random.normal(jax.random.key(0), (1, 128, 128, 2)) + 0.5
    wm = jnp.ones((1, 32, 32, 1)) * 0.5
    p = m.init(jax.random.key(1), x, wm)
    enc, _ = m.apply(p, x, wm)
    ang_in = np.arctan2(np.asarray(x[..., 1]), np.asarray(x[..., 0]))
    ang_out = np.arctan2(np.asarray(enc[..., 1]), np.asarray(enc[..., 0]))
    # phase preserved where magnitude stays positive
    mag_out = np.hypot(np.asarray(enc[..., 0]), np.asarray(enc[..., 1]))
    keep = mag_out > 1e-3
    d = np.abs(((ang_in - ang_out + np.pi) % (2 * np.pi)) - np.pi)[keep]
    assert np.median(d) < 0.2


def test_spectral_loss():
    w1 = jax.random.normal(jax.random.key(0), (2, 16000)) * 0.1
    assert float(spectral_loss(w1, w1)) < 1e-10
    assert float(spectral_loss(w1, w1 * 0.5)) > 0


def test_cross_modulator_block():
    blk = LeWinTransformerBlock(dim=8, input_resolution=(16, 16),
                                num_heads=2, cross_modulator=True)
    x = jax.random.normal(jax.random.key(0), (1, 256, 8))
    p = blk.init(jax.random.key(1), x)
    y = blk.apply(p, x)
    assert y.shape == x.shape
    assert "cross_attn" in p["params"]
    assert "cross_modulator" in p["params"]


def test_tb_logger(tmp_path):
    import json

    from image_in_speech_watermarking_tpu.utils.tb_logger import (
        TensorBoardLogger)

    lg = TensorBoardLogger(str(tmp_path))
    lg.save_losses({"loss": 1.5}, step=1)
    lg.save_gradients({"w": np.ones((3, 3))}, step=1)
    lg.save_tensors({"act": np.zeros(10)}, step=1)
    lg.close()
    lines = [json.loads(l) for l in open(tmp_path / "events.jsonl")]
    kinds = {l["type"] for l in lines}
    assert kinds == {"losses", "grad_hist", "tensor_hist"}
