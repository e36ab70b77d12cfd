"""Auxiliary blocks the reference defines but does not wire into the audio
path (kept for component-inventory completeness).

Parity targets (uformerWM/model.py):
  SAM     model.py:95-108   supervised attention module
  LPU     model.py:231-251  local perception unit: DWConv(x) + x
  PosCNN  model.py:258-279  conv positional encoding on token grids
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SAM(nn.Module):
    """Supervised attention module (model.py:95-108): produces a
    restored-image side output and an attention-gated feature."""

    n_feat: int
    out_chans: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_img: jnp.ndarray):
        x1 = nn.Conv(self.n_feat, (3, 3), padding=1, name="conv1")(x)
        img = nn.Conv(self.out_chans, (3, 3), padding=1,
                      name="conv2")(x) + x_img
        gate = nn.sigmoid(nn.Conv(self.n_feat, (3, 3), padding=1,
                                  name="conv3")(img))
        return x1 * gate + x, img


class LPU(nn.Module):
    """LPU(x) = DWConv3x3(x) + x on a (B, L, C) token grid
    (model.py:231-251)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, l, c = x.shape
        img = x.reshape(b, h, w, c)
        y = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                    name="depthwise")(img)
        return (y + img).reshape(b, l, c)


class PosCNN(nn.Module):
    """Conv positional encoding (model.py:258-279): depthwise conv3x3 on
    the token grid, residual when stride 1."""

    embed_dim: int
    s: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, n, c = x.shape
        img = x.reshape(b, h, w, c)
        y = nn.Conv(self.embed_dim, (3, 3), strides=self.s, padding=1,
                    feature_group_count=self.embed_dim, name="proj")(img)
        if self.s == 1:
            y = y + img
        return y.reshape(b, -1, self.embed_dim)
