"""Image-restoration heritage path + legacy audio helpers + extras."""

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu.data.image_restoration import (
    DenoisePatchDataset, augment_8way, mixup, synthetic_image_pairs)
from image_in_speech_watermarking_tpu.data.legacy_audio import (
    AudioMark, AudioMarkAll, align_audio_len, gen_watermarking, sw_to_stft)
from image_in_speech_watermarking_tpu.eval.image_metrics import (
    batch_psnr, calculate_psnr, calculate_ssim)
from image_in_speech_watermarking_tpu.models.extras import LPU, SAM, PosCNN


def test_psnr_reference_formula():
    a = np.full((16, 16, 3), 0.5)
    assert calculate_psnr(a, a) == float("inf")
    b = a + 10.0 / 255.0
    # PSNR = 20 log10(255 / 10) = 28.13
    assert abs(calculate_psnr(a, b) - 20 * np.log10(255 / 10)) < 1e-6
    assert batch_psnr(a[None], b[None]) == calculate_psnr(a, b)


def test_ssim_bounds():
    rng = np.random.default_rng(0)
    a = rng.random((32, 32, 3))
    assert calculate_ssim(a, a) > 0.99
    assert calculate_ssim(a, 1 - a) < 0.3


def test_denoise_dataset_and_aug():
    clean, noisy = synthetic_image_pairs(4, 32, sigma=25.0)
    assert clean.shape == (4, 32, 32, 3)
    assert 0 < np.abs(clean - noisy).mean() < 0.2
    c2, n2 = augment_8way(clean[0], noisy[0], mode=3)
    assert c2.shape == clean[0].shape
    ds = DenoisePatchDataset(clean, noisy, patch_size=16, use_mixup=True)
    cb, nb = next(ds.batches(2))
    assert cb.shape == (2, 16, 16, 3)
    mc, mn = mixup(clean, noisy, np.random.default_rng(0))
    assert mc.shape == clean.shape


def test_legacy_audio_helpers():
    waves = [np.ones(100, np.float32), np.ones(150, np.float32)]
    al = align_audio_len(waves)
    assert al.shape == (2, 150) and al[0, 120] == 0
    spec = sw_to_stft(waves, n_fft=255)
    assert spec.shape[0] == 2 and spec.shape[1] == 128
    wm = gen_watermarking(32, "binary", seed=0)
    assert set(np.unique(wm)) <= {0.0, 1.0}
    wm2 = gen_watermarking(32, "sign", seed=0)
    assert set(np.unique(wm2)) <= {-1.0, 1.0}
    marks = [gen_watermarking(32, seed=s) for s in range(3)]
    ds = AudioMark(waves, marks)
    assert len(ds) == 6
    w, m = ds[3]
    assert w is waves[1] and m is marks[1]
    ds2 = AudioMarkAll(waves, marks)
    w, m = ds2[4]
    assert w is waves[1] and m is marks[1]


def test_extras_shapes():
    x = jax.random.normal(jax.random.key(0), (2, 64, 8))
    lpu = LPU()
    p = lpu.init(jax.random.key(1), x, 8, 8)
    assert lpu.apply(p, x, 8, 8).shape == x.shape
    pos = PosCNN(embed_dim=8)
    p = pos.init(jax.random.key(2), x, 8, 8)
    assert pos.apply(p, x, 8, 8).shape == x.shape
    feat = jax.random.normal(jax.random.key(3), (2, 16, 16, 8))
    img = jax.random.normal(jax.random.key(4), (2, 16, 16, 3))
    sam = SAM(n_feat=8)
    p = sam.init(jax.random.key(5), feat, img)
    y, side = sam.apply(p, feat, img)
    assert y.shape == feat.shape and side.shape == img.shape


def test_blur_downsample():
    from image_in_speech_watermarking_tpu.utils.antialias import (
        blur_downsample)

    x = jax.random.uniform(jax.random.key(0), (2, 16, 16, 3))
    y = blur_downsample(x)
    assert y.shape == (2, 8, 8, 3)
    c = jnp.ones((1, 8, 8, 2)) * 0.7
    assert float(jnp.abs(blur_downsample(c) - 0.7).max()) < 1e-6


def test_flops_accounting():
    """utils/flops: parameter accounting matches a hand count and the XLA
    cost analysis returns sane positive numbers (reference annotates
    per-module flops, model.py:2784-2805)."""
    import jax
    import jax.numpy as jnp
    from image_in_speech_watermarking_tpu.utils import flops

    params = {"a": {"kernel": jnp.zeros((3, 4)), "bias": jnp.zeros(4)},
              "b": {"kernel": jnp.zeros((4, 5))}}
    assert flops.param_count(params) == 12 + 4 + 20
    table = flops.param_table(params)
    assert table == {"b": 20, "a": 16}

    def fn(x):
        return (x @ x.T).sum()

    prof = flops.profile_fn(fn, jnp.ones((64, 64)))
    assert prof["flops"] >= 2 * 64 * 64 * 64 * 0.9
    assert prof["bytes_accessed"] > 0
    rl = flops.roofline_ms(prof)
    assert rl["roofline_ms"] > 0
