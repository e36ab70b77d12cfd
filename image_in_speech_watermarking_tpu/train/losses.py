"""Loss functions of the image-restoration heritage path.

Parity target: uformerWM/losses.py:8-52 — CharbonnierLoss
(sqrt(diff^2 + eps^2) mean, eps=1e-3), TVLoss / tv_loss."""

from __future__ import annotations

import jax.numpy as jnp


def charbonnier_loss(x: jnp.ndarray, y: jnp.ndarray,
                     eps: float = 1e-3) -> jnp.ndarray:
    """uformerWM/losses.py:8-19."""
    diff = x - y
    return jnp.mean(jnp.sqrt(diff * diff + eps * eps))


def tv_loss(x: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """Total variation over NHWC images (uformerWM/losses.py:22-52)."""
    b, h, w, c = x.shape
    dh = x[:, 1:, :, :] - x[:, :-1, :, :]
    dw = x[:, :, 1:, :] - x[:, :, :-1, :]
    count_h = (h - 1) * w * c
    count_w = h * (w - 1) * c
    return weight * 2.0 * (jnp.sum(dh ** 2) / count_h
                           + jnp.sum(dw ** 2) / count_w) / b
