"""Image-restoration data pipeline (the inherited Uformer denoise/deblur
training path).

Parity targets:
  dataset_denoise.py:42-73  — paired patch dataset with random crop and
      8-way flip/rotate augmentation
  train_denoise.py:181-182  — MixUp after warmup epochs
  utils/dataset_utils.py    — MixUp_AUG (beta(1.2, 1.2) pair mixing)

Zero-egress note: SIDD/DnD/GoPro archives are unavailable; loaders accept
any directory of paired arrays and a synthetic noisy-image generator keeps
the path runnable.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import numpy as np


def synthetic_image_pairs(n: int, size: int = 128, seed: int = 0,
                          sigma: float = 25.0
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(clean, noisy) HWC float pairs: smooth random fields + AWGN."""
    rng = np.random.default_rng(seed)
    clean = []
    for _ in range(n):
        base = rng.random((size // 8, size // 8, 3)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8, 1), dtype=np.float32))
        k = np.array([0.25, 0.5, 0.25])
        for ax in (0, 1):
            img = np.apply_along_axis(
                lambda r: np.convolve(r, k, mode="same"), ax, img)
        clean.append(np.clip(img, 0, 1))
    clean = np.stack(clean)
    noisy = np.clip(
        clean + rng.standard_normal(clean.shape).astype(np.float32)
        * (sigma / 255.0), 0, 1)
    return clean, noisy


def augment_8way(clean: np.ndarray, noisy: np.ndarray,
                 mode: int) -> Tuple[np.ndarray, np.ndarray]:
    """The 8 dihedral augmentations (dataset_denoise.py:60-71)."""
    def ap(x):
        if mode % 2:
            x = x[:, ::-1]           # horizontal flip
        return np.rot90(x, k=mode // 2, axes=(0, 1))
    return ap(clean), ap(noisy)


def mixup(clean: np.ndarray, noisy: np.ndarray,
          rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """MixUp_AUG (utils/dataset_utils.py): beta(1.2, 1.2) blend with a
    shuffled pairing."""
    lam = rng.beta(1.2, 1.2, size=(clean.shape[0], 1, 1, 1)).astype(
        clean.dtype)
    perm = rng.permutation(clean.shape[0])
    return (lam * clean + (1 - lam) * clean[perm],
            lam * noisy + (1 - lam) * noisy[perm])


class DenoisePatchDataset:
    """Random-crop + 8-way-augment patch batches over (clean, noisy)
    pairs (dataset_denoise.py:42-73)."""

    def __init__(self, clean: np.ndarray, noisy: np.ndarray,
                 patch_size: int = 128, use_mixup: bool = False,
                 seed: int = 1234):
        assert clean.shape == noisy.shape
        self.clean, self.noisy = clean, noisy
        self.ps = patch_size
        self.use_mixup = use_mixup
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.clean)

    def batches(self, batch_size: int) -> Iterator[Tuple[np.ndarray,
                                                         np.ndarray]]:
        idx = self.rng.permutation(len(self.clean))
        h, w = self.clean.shape[1:3]
        ps = min(self.ps, h, w)
        for i in range(0, len(idx) - batch_size + 1, batch_size):
            cs, ns = [], []
            for j in idx[i:i + batch_size]:
                r = int(self.rng.integers(0, h - ps + 1))
                c = int(self.rng.integers(0, w - ps + 1))
                mode = int(self.rng.integers(0, 8))
                cc, nn = augment_8way(
                    self.clean[j, r:r + ps, c:c + ps],
                    self.noisy[j, r:r + ps, c:c + ps], mode)
                cs.append(cc)
                ns.append(nn)
            cb, nb = np.stack(cs), np.stack(ns)
            if self.use_mixup:
                cb, nb = mixup(cb, nb, self.rng)
            yield cb.copy(), nb.copy()
