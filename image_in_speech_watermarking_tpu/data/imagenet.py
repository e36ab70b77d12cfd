"""ImageNetMini cover dataset (``--dataset imagenet``).

Parity target: uformerWM/audio_uformer_stft.py:150-204 — the train
driver's 'imagenet' mode replaces speech STFT clips with 128x128
RandomCrop RGB images (ImageNet-mini files >= 128px, cap 12000),
normalized with the torchvision ImageNet mean/std, as covers for the
watermark embedder.

Zero-egress handling: if ``data/imagenet-mini/train/*/*.JP*G`` exists on
disk it is loaded (PIL); otherwise deterministic procedural images
(mixed gradients + filtered noise, ImageNet-normalized) keep the path
runnable, mirroring data/speech.py's synthetic fallback.
"""

from __future__ import annotations

import glob
import os
import warnings
from typing import Iterator, Sequence

import numpy as np

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)
IMAGENET_ROOT = os.path.join("data", "imagenet-mini", "train")


def _synthetic_image(seed: int, size: int = 128) -> np.ndarray:
    """Procedural RGB stand-in: smooth color field + band-limited
    texture, in [0, 1]."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    img = np.zeros((size, size, 3), np.float32)
    for c in range(3):
        a, b, ph = rng.uniform(0.5, 3.0, 2), rng.uniform(0, 2 * np.pi), 0
        img[..., c] = 0.5 + 0.25 * np.sin(2 * np.pi * (a[0] * xx
                                                       + a[1] * yy) + b)
    # low-pass noise texture via separable box blurs
    noise = rng.standard_normal((size, size, 3)).astype(np.float32)
    k = np.ones(9, np.float32) / 9.0
    for ax in (0, 1):
        noise = np.apply_along_axis(
            lambda m: np.convolve(m, k, mode="same"), ax, noise)
    img = np.clip(img + 0.3 * noise, 0.0, 1.0)
    return img


def load_imagenet_covers(size: int, seed: int = 42,
                         root: str = IMAGENET_ROOT,
                         crop: int = 128) -> np.ndarray:
    """(size, crop, crop, 3) float32 ImageNet-normalized covers."""
    rng = np.random.default_rng(seed)
    files = sorted(glob.glob(os.path.join(root, "*", "*.JP*G"))
                   + glob.glob(os.path.join(root, "*", "*.jp*g")))
    images = []
    if files:
        try:
            from PIL import Image  # type: ignore

            for f in files:
                if len(images) >= size:
                    break
                try:
                    im = Image.open(f).convert("RGB")
                    if im.size[0] >= crop and im.size[1] >= crop:
                        arr = np.asarray(im, np.float32) / 255.0
                        y = rng.integers(0, arr.shape[0] - crop + 1)
                        x = rng.integers(0, arr.shape[1] - crop + 1)
                        images.append(arr[y:y + crop, x:x + crop])
                except Exception:
                    continue
        except ImportError:
            warnings.warn("PIL unavailable; using procedural covers")
    if len(images) < size:
        if files:
            warnings.warn(
                f"only {len(images)}/{size} imagenet-mini images usable; "
                "topping up with procedural covers")
        images += [_synthetic_image(seed + 977 * i)
                   for i in range(size - len(images))]
    batch = np.stack(images[:size]).astype(np.float32)
    return (batch - _MEAN) / _STD


class ImageCoverDataset:
    """Drop-in cover dataset for the Trainer (speech.SpeechDataset's
    train-mode API surface: kind/clips/__len__/batches)."""

    kind = "train"

    def __init__(self, size: int = 300, seed: int = 42,
                 root: str = IMAGENET_ROOT):
        self.clips = load_imagenet_covers(size, seed=seed, root=root)
        self.data_min, self.data_max = 0.0, 1.0

    def __len__(self) -> int:
        return len(self.clips)

    def batches(self, batch_size: int, seed=0,
                drop_last: bool = True) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(seed)
        idx = rng.permutation(len(self.clips))
        end = (len(idx) // batch_size) * batch_size if drop_last \
            else len(idx)
        for i in range(0, end, batch_size):
            yield self.clips[idx[i:i + batch_size]]
