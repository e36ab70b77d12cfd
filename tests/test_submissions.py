"""Leaderboard plumbing (eval/submissions.py) on synthetic .mat fixtures."""

import numpy as np
import pytest
import scipy.io as sio

from image_in_speech_watermarking_tpu.eval import submissions


def test_bundle_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    crops = {}
    for i in range(1, 3):
        for bb in range(1, 4):
            c = rng.random((8, 8, 3)).astype(np.float32)
            crops[(i, bb)] = c
            submissions.save_denoised_crop(str(tmp_path), i, bb, c)
    out = submissions.bundle_submissions(str(tmp_path), "srgb",
                                         israw=False, n_images=2,
                                         n_blocks=3)
    for i in range(1, 3):
        m = sio.loadmat(f"{out}/{i:04d}.mat")
        assert m["Idenoised"].shape[-1] == 3  # object array of 3 crops
        assert str(m["eval_version"][0]) == "1.0"
        got = m["Idenoised"][0, 2]
        np.testing.assert_allclose(got, crops[(i, 3)], rtol=1e-6)


def test_eval_sidd_identical_is_inf_psnr_unit_ssim(capsys):
    img = np.random.default_rng(1).random((2, 3, 16, 16, 3)) \
        .astype(np.float32)
    psnr, ssim = submissions.eval_sidd(img, img)
    assert psnr == float("inf")
    assert ssim == pytest.approx(1.0, abs=1e-6)
    assert "PSNR" in capsys.readouterr().out


def test_eval_sidd_noisy_scores_lower():
    rng = np.random.default_rng(2)
    gt = rng.random((1, 2, 32, 32, 3)).astype(np.float32)
    noisy = np.clip(gt + 0.1 * rng.standard_normal(gt.shape), 0, 1) \
        .astype(np.float32)
    psnr, ssim = submissions.eval_sidd(noisy, gt, verbose=False)
    assert 10 < psnr < 30
    assert 0 < ssim < 0.99


def test_sidd_loader_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        submissions.load_sidd_val(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        list(submissions.iter_dnd_crops(str(tmp_path)))


def test_sidd_loader_reads_mats(tmp_path):
    rng = np.random.default_rng(3)
    noisy = (rng.random((2, 2, 8, 8, 3)) * 255).astype(np.uint8)
    gt = rng.random((2, 2, 8, 8, 3)).astype(np.float32)
    sio.savemat(tmp_path / "ValidationNoisyBlocksSrgb.mat",
                {"ValidationNoisyBlocksSrgb": noisy})
    sio.savemat(tmp_path / "ValidationGtBlocksSrgb.mat",
                {"ValidationGtBlocksSrgb": gt})
    n, g = submissions.load_sidd_val(str(tmp_path))
    assert n.dtype == np.float32 and n.max() <= 1.0
    np.testing.assert_allclose(g, gt)
