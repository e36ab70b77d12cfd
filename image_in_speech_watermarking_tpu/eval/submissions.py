"""Denoising-benchmark leaderboard plumbing (inherited Uformer heritage).

Parity targets:
  bundle_submissions_{raw,srgb,srgb_v1}  uformerWM/utils/bundle_submissions.py
      (three near-identical functions -> one parametrized bundler here)
  eval_sidd.m                            uformerWM/test/eval_sidd.m
      (MATLAB PSNR/SSIM over 40x32 denoised blocks -> python, reusing
       eval/image_metrics.py)
  SIDD/DnD mat loaders                   uformerWM/test/test_sidd.py:40-60,
                                         test_dnd.py (50 images x 20 boxes)

The external datasets are not shipped in this environment, so every
loader is gated on file presence and raises FileNotFoundError with the
expected layout; the bundling and scoring logic is exercised by tests on
synthetic .mat fixtures.
"""

from __future__ import annotations

import os
from typing import Iterator, Tuple

import numpy as np
import scipy.io as sio

from image_in_speech_watermarking_tpu.eval.image_metrics import (
    calculate_psnr, calculate_ssim)

_EVAL_VERSION = "1.0"


def bundle_submissions(submission_folder: str, session: str,
                       israw: bool = False, n_images: int = 50,
                       n_blocks: int = 20,
                       zero_pad_block: bool = True) -> str:
    """Bundle per-crop mats '%04d_%02d.mat' (each holding
    ``Idenoised_crop``) into per-image '%04d.mat' files with the
    {Idenoised, israw, eval_version} schema the SIDD/DnD servers expect
    (bundle_submissions.py). ``israw`` selects the raw-Bayer flavor;
    ``zero_pad_block=False`` reproduces the *_v1 naming ('%04d_%d')."""
    out_folder = os.path.join(submission_folder, session)
    os.makedirs(out_folder, exist_ok=True)
    fmt = "%04d_%02d.mat" if zero_pad_block else "%04d_%d.mat"
    for i in range(n_images):
        crops = np.empty((n_blocks,), dtype=object)
        for bb in range(n_blocks):
            s = sio.loadmat(
                os.path.join(submission_folder, fmt % (i + 1, bb + 1)))
            crops[bb] = s["Idenoised_crop"]
        sio.savemat(os.path.join(out_folder, "%04d.mat" % (i + 1)),
                    {"Idenoised": crops, "israw": israw,
                     "eval_version": _EVAL_VERSION})
    return out_folder


def save_denoised_crop(folder: str, image_idx: int, block_idx: int,
                       crop: np.ndarray) -> None:
    """Write one '%04d_%02d.mat' crop file (test_dnd.py protocol)."""
    os.makedirs(folder, exist_ok=True)
    sio.savemat(os.path.join(folder,
                             "%04d_%02d.mat" % (image_idx, block_idx)),
                {"Idenoised_crop": np.asarray(crop, np.float32)})


def load_sidd_val(input_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    """SIDD validation blocks: (40, 32, 256, 256, 3) noisy + GT float32
    in [0,1] (test_sidd.py:40-47 ValidationNoisyBlocksSrgb.mat /
    ValidationGtBlocksSrgb.mat)."""
    noisy_p = os.path.join(input_dir, "ValidationNoisyBlocksSrgb.mat")
    gt_p = os.path.join(input_dir, "ValidationGtBlocksSrgb.mat")
    if not (os.path.exists(noisy_p) and os.path.exists(gt_p)):
        raise FileNotFoundError(
            f"SIDD val mats not found under {input_dir!r} (expected "
            "ValidationNoisyBlocksSrgb.mat + ValidationGtBlocksSrgb.mat)")
    noisy = sio.loadmat(noisy_p)["ValidationNoisyBlocksSrgb"]
    gt = sio.loadmat(gt_p)["ValidationGtBlocksSrgb"]
    to_f = lambda a: (np.float32(a) / 255.0  # noqa: E731
                      if a.dtype == np.uint8 else np.float32(a))
    return to_f(noisy), to_f(gt)


def iter_dnd_crops(data_dir: str) -> Iterator[
        Tuple[int, int, np.ndarray]]:
    """DnD benchmark: yields (image_idx 1-50, block_idx 1-20, noisy crop)
    from info.mat bounding boxes + per-image .mat files (test_dnd.py).
    Requires h5py (DnD mats are v7.3)."""
    import h5py  # DnD ships MATLAB v7.3 files

    info_p = os.path.join(data_dir, "info.mat")
    if not os.path.exists(info_p):
        raise FileNotFoundError(
            f"DnD info.mat not found under {data_dir!r}")
    with h5py.File(info_p, "r") as info_f:
        info = info_f["info"]
        bb_refs = info["boundingboxes"]
        for i in range(50):
            img_p = os.path.join(data_dir, "images_srgb",
                                 "%04d.mat" % (i + 1))
            with h5py.File(img_p, "r") as img_f:
                noisy = np.float32(np.array(img_f["InoisySRGB"]).T)
            boxes = np.array(info_f[bb_refs[0][i]]).T
            for k in range(20):
                idx = [int(boxes[k, 0] - 1), int(boxes[k, 2]),
                       int(boxes[k, 1] - 1), int(boxes[k, 3])]
                yield i + 1, k + 1, noisy[idx[0]:idx[1], idx[2]:idx[3]]


def eval_sidd(denoised: np.ndarray, gt: np.ndarray,
              verbose: bool = True) -> Tuple[float, float]:
    """Python port of eval_sidd.m: mean PSNR/SSIM over all (image, block)
    pairs of (N, K, H, W, C) arrays in [0, 1]."""
    n, k = denoised.shape[:2]
    tp = ts = 0.0
    for i in range(n):
        for b in range(k):
            tp += calculate_psnr(denoised[i, b], gt[i, b])
            ts += calculate_ssim(denoised[i, b], gt[i, b])
    qm_psnr, qm_ssim = tp / (n * k), ts / (n * k)
    if verbose:
        print(f"PSNR: {qm_psnr:f} SSIM: {qm_ssim:f}")
    return qm_psnr, qm_ssim
