"""Antialiased (blur-pool) downsampling.

Parity target: uformerWM/utils/antialias.py:7-60 (Zhang 2019 BlurPool:
binomial filter + reflect pad + strided depthwise conv). Functional jnp
form over NHWC images."""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=8)
def _binomial_filter(filt_size: int) -> np.ndarray:
    row = np.array([math.comb(filt_size - 1, k)
                    for k in range(filt_size)], dtype=np.float64)
    f = row[:, None] * row[None, :]
    return (f / f.sum()).astype(np.float32)


def blur_downsample(x: jnp.ndarray, filt_size: int = 3,
                    stride: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, ceil(H/stride), ceil(W/stride), C)."""
    b, h, w, c = x.shape
    if filt_size == 1:
        return x[:, ::stride, ::stride, :]
    lo = (filt_size - 1) // 2
    hi = int(np.ceil((filt_size - 1) / 2))
    xp = jnp.pad(x, ((0, 0), (lo, hi), (lo, hi), (0, 0)), mode="reflect")
    filt = jnp.asarray(_binomial_filter(filt_size), dtype=x.dtype)
    kernel = jnp.tile(filt[:, :, None, None], (1, 1, 1, c))
    return lax.conv_general_dilated(
        xp, kernel, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
