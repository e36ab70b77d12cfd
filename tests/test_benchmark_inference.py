"""expand2square padded-inference protocol (eval/benchmark_inference.py,
test_sidd.py:79-116 / test_dnd.py:79-100 parity) on synthetic fixtures."""

import numpy as np
import pytest
from scipy import io as sio

from image_in_speech_watermarking_tpu.eval import benchmark_inference as bi


class _IdentityModel:
    """Stands in for a restoration model: returns its input."""

    def apply(self, variables, x, deterministic=True):
        return x


def test_expand2square_geometry():
    import jax.numpy as jnp

    img = jnp.asarray(np.random.default_rng(0).random((2, 100, 180, 3),
                                                      ).astype(np.float32))
    padded, (x, top, left) = bi.expand2square(img, factor=128)
    assert padded.shape == (2, 256, 256, 3)       # ceil(180/128)*128
    assert (top, left) == ((256 - 100) // 2, (256 - 180) // 2)
    # original content centered, rest zero
    np.testing.assert_array_equal(
        np.asarray(padded)[:, top:top + 100, left:left + 180], img)
    assert float(jnp.abs(padded).sum()) == pytest.approx(
        float(jnp.abs(img).sum()), rel=1e-6)


def test_restore_batch_identity_roundtrip():
    crops = np.random.default_rng(1).random((3, 96, 144, 3)).astype(
        np.float32)
    out = bi.restore_batch(_IdentityModel(), {}, crops, factor=64)
    np.testing.assert_allclose(out, crops, atol=1e-6)


def test_run_sidd_protocol(tmp_path):
    """Tiny synthetic SIDD val set: the full protocol writes pngs + a
    correctly-shaped Idenoised.mat that round-trips."""
    rng = np.random.default_rng(2)
    noisy = rng.random((2, 3, 64, 64, 3)).astype(np.float32)
    sio.savemat(tmp_path / "ValidationNoisyBlocksSrgb.mat",
                {"ValidationNoisyBlocksSrgb": noisy})
    sio.savemat(tmp_path / "ValidationGtBlocksSrgb.mat",
                {"ValidationGtBlocksSrgb": noisy})
    out = bi.run_sidd(_IdentityModel(), {}, str(tmp_path),
                      str(tmp_path / "res"), factor=64)
    got = sio.loadmat(out)["Idenoised"]
    assert got.shape == noisy.shape
    np.testing.assert_allclose(got, noisy, atol=1e-6)
