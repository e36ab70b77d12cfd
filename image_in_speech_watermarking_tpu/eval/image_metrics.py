"""Image restoration metrics (PSNR / SSIM) — the inherited Uformer
benchmark protocol.

Parity targets: uformerWM/utils/caculate_psnr_ssim.py:12-90 (255-scale
PSNR; SSIM with 11x11 sigma-1.5 Gaussian window on uint8-rounded inputs)
and uformerWM/utils/image_utils.py (batch_PSNR, myPSNR). cv2 is replaced
by a numpy Gaussian filter (identical same-size border behaviour is not
needed because the reference crops 5 px before comparing)."""

from __future__ import annotations

import numpy as np


def calculate_psnr(img1: np.ndarray, img2: np.ndarray,
                   crop_border: int = 0) -> float:
    """255-scale PSNR on HWC float images in [0, 1] or uint8
    (caculate_psnr_ssim.py:12-32)."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    if img1.max() <= 1.5:
        img1, img2 = img1 * 255.0, img2 * 255.0
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return 20.0 * np.log10(255.0 / np.sqrt(mse))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    k = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(k ** 2) / (2 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g)


def _filter2d_valid(img: np.ndarray, window: np.ndarray) -> np.ndarray:
    """'valid' 2-D correlation (matches cv2.filter2D + [5:-5, 5:-5])."""
    kh, kw = window.shape
    h, w = img.shape
    out = np.zeros((h - kh + 1, w - kw + 1))
    for i in range(kh):
        for j in range(kw):
            out += window[i, j] * img[i:i + h - kh + 1, j:j + w - kw + 1]
    return out


def _ssim_channel(img1: np.ndarray, img2: np.ndarray) -> float:
    """caculate_psnr_ssim.py:36-56 on one uint8-scale channel."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    window = _gaussian_window()
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    mu1 = _filter2d_valid(img1, window)
    mu2 = _filter2d_valid(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = _filter2d_valid(img1 ** 2, window) - mu1_sq
    s2 = _filter2d_valid(img2 ** 2, window) - mu2_sq
    s12 = _filter2d_valid(img1 * img2, window) - mu1_mu2
    m = ((2 * mu1_mu2 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return float(m.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray,
                   crop_border: int = 0) -> float:
    """Mean per-channel SSIM on uint8-rounded images
    (caculate_psnr_ssim.py:59-90)."""
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    if img1.dtype != np.uint8:
        img1 = (np.clip(img1, 0, 1) * 255.0).round().astype(np.uint8)
    if img2.dtype != np.uint8:
        img2 = (np.clip(img2, 0, 1) * 255.0).round().astype(np.uint8)
    if crop_border:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    if img1.ndim == 2:
        img1, img2 = img1[..., None], img2[..., None]
    return float(np.mean([_ssim_channel(img1[..., i], img2[..., i])
                          for i in range(img1.shape[2])]))


def batch_psnr(batch1: np.ndarray, batch2: np.ndarray) -> float:
    """Mean PSNR over a batch (utils/image_utils.py batch_PSNR)."""
    return float(np.mean([calculate_psnr(a, b)
                          for a, b in zip(batch1, batch2)]))
