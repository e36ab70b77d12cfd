"""Image-restoration benchmark inference protocol (SIDD / DnD).

Parity target: uformerWM/test/test_sidd.py:79-116 and test_dnd.py:79-100
— the expand2square padded-inference protocol: center-pad each crop to a
square multiple of the window factor (128), run the restoration model,
masked-select the original region back, clip to [0, 1], save pngs + the
submission .mat.

TPU-first: equally-sized crops are batched through ONE jitted forward
(the reference loops crop-by-crop with B=1); variable DnD sizes bucket
by padded size so the sweep compiles O(distinct sizes) programs.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def expand2square(img: jnp.ndarray, factor: int = 128
                  ) -> Tuple[jnp.ndarray, Tuple[int, int, int]]:
    """Center-pad (B, H, W, C) to (B, X, X, C) with X = ceil(max/f)*f
    (test_sidd.py:78-91). Returns (padded, (X, top, left))."""
    b, h, w, c = img.shape
    x = int(math.ceil(max(h, w) / float(factor)) * factor)
    top, left = (x - h) // 2, (x - w) // 2
    padded = jnp.zeros((b, x, x, c), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (0, top, left, 0))
    return padded, (x, top, left)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _restore_padded(model, variables, padded, h: int, w: int,
                    top_left: Tuple[int, int]) -> jnp.ndarray:
    out = model.apply(variables, padded, True)
    top, left = top_left
    out = jax.lax.dynamic_slice(
        out, (0, top, left, 0), (out.shape[0], h, w, out.shape[3]))
    return jnp.clip(out, 0.0, 1.0)


def restore_batch(model, variables, crops: np.ndarray,
                  factor: int = 128) -> np.ndarray:
    """(B, H, W, C) noisy crops -> (B, H, W, C) restored, via the
    expand2square protocol, one jitted forward for the whole batch."""
    img = jnp.asarray(crops, jnp.float32)
    b, h, w, c = img.shape
    padded, (x, top, left) = expand2square(img, factor)
    return np.asarray(_restore_padded(model, variables, padded, h, w,
                                      (top, left)))


def _save_png(path: str, img: np.ndarray) -> None:
    """img_as_ubyte + save_img equivalent (test_sidd.py:112-113)."""
    from matplotlib import image as mpimg

    mpimg.imsave(path, np.clip(img, 0.0, 1.0))


def run_sidd(model, variables, input_dir: str, result_dir: str,
             factor: int = 128, block_batch: int = 32) -> str:
    """SIDD validation protocol (test_sidd.py:94-116): restore all 40x32
    256x256 blocks, save per-block pngs + Idenoised.mat."""
    from image_in_speech_watermarking_tpu.eval.submissions import (
        load_sidd_val)

    noisy, _ = load_sidd_val(input_dir)          # (40, 32, 256, 256, 3)
    restored = np.zeros_like(noisy)
    n_img, n_blk = noisy.shape[:2]
    png_dir = os.path.join(result_dir, "png")
    os.makedirs(png_dir, exist_ok=True)
    for i in range(n_img):
        for k0 in range(0, n_blk, block_batch):
            blocks = noisy[i, k0:k0 + block_batch]
            restored[i, k0:k0 + block_batch] = restore_batch(
                model, variables, blocks, factor)
        for k in range(n_blk):
            _save_png(os.path.join(
                png_dir, "%04d_%02d.png" % (i + 1, k + 1)),
                restored[i, k])
    out = os.path.join(result_dir, "mat")
    os.makedirs(out, exist_ok=True)
    from scipy import io as sio

    sio.savemat(os.path.join(out, "Idenoised.mat"),
                {"Idenoised": restored})
    return os.path.join(out, "Idenoised.mat")


def run_dnd(model, variables, data_dir: str, result_dir: str,
            factor: int = 128) -> str:
    """DnD protocol (test_dnd.py:79-100): restore each bounding-box crop
    with padded inference, save per-image .mat crops for the official
    bundler (eval/submissions.bundle_submissions)."""
    from image_in_speech_watermarking_tpu.eval.submissions import (
        iter_dnd_crops)
    from scipy import io as sio

    out = os.path.join(result_dir, "dnd_out")
    os.makedirs(out, exist_ok=True)
    for img_idx, blk_idx, crop in iter_dnd_crops(data_dir):
        restored = restore_batch(model, variables, crop[None], factor)[0]
        sio.savemat(os.path.join(out, "%04d_%02d.mat" % (img_idx, blk_idx)),
                    {"Idenoised_crop": restored.astype(np.float32)})
    return out
