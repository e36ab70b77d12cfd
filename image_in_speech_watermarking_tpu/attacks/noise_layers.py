"""HiDDeN image-domain noise layers + random Noiser dispatcher, pure JAX.

Parity targets (reference: hidden/noise_layers/):
  Identity       identity.py:4-12
  Crop           crop.py:48-75     (random rectangle)
  Cropout        cropout.py:6-28   (rect keeps noised, rest restores cover)
  Dropout        dropout.py:5-28   (per-pixel Bernoulli blend)
  Resize         resize.py:6-26    (nearest resize by random ratio)
  Quantization   quantization.py:6-45 (Fourier-series differentiable round)
  JpegCompression jpeg_compression.py:6-160 (8x8 DCT + zigzag keep mask)
  Noiser         noiser.py:8-31    (pick ONE random layer per batch)

Static-shape adaptations (XLA requires fixed shapes):
  * Crop keeps the canvas size and zeroes outside the random rectangle
    (the reference returns a smaller tensor; its fully-conv decoder sees
    the same content either way).
  * Resize downscales by the random ratio and upscales back to the canvas
    (the information loss, which is what the attack trains against, is
    identical; the reference hands the smaller image to a fully-conv net).

All layers share the signature ``(key, noised, cover) -> noised`` over NHWC
images, so the whole bank dispatches through ``lax.switch`` inside jit.
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _random_float(key, lo: float, hi: float):
    return jax.random.uniform(key) * (hi - lo) + lo


def _random_rectangle(key, h: int, w: int, height_ratio, width_ratio):
    """Random rect inside (h, w) — crop.py:16-45. Returns (h0, h1, w0, w1)
    as traced scalars. NOTE: the reference samples remaining width from
    ``width_ratio_range[0]`` twice (crop.py:33, an upstream quirk kept for
    exactness)."""
    kh, kw, ksh, ksw = jax.random.split(key, 4)
    rem_h = jnp.rint(_random_float(kh, *height_ratio) * h).astype(jnp.int32)
    rem_w = jnp.rint(_random_float(kw, width_ratio[0], width_ratio[0]) * w
                     ).astype(jnp.int32)
    h0 = jax.random.randint(ksh, (), 0, jnp.maximum(h - rem_h, 1))
    w0 = jax.random.randint(ksw, (), 0, jnp.maximum(w - rem_w, 1))
    return h0, h0 + rem_h, w0, w0 + rem_w


def _rect_mask(h: int, w: int, h0, h1, w0, w1) -> jnp.ndarray:
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    return ((rows >= h0) & (rows < h1) & (cols >= w0) & (cols < w1)
            ).astype(jnp.float32)


def identity(key, noised, cover):
    del key, cover
    return noised


def crop(key, noised, cover, height_ratio=(0.2, 0.25),
         width_ratio=(0.2, 0.25)):
    """Keep a random rectangle of the noised image (crop.py:48-75);
    static-shape variant zeroes the outside."""
    del cover
    _, h, w, _ = noised.shape
    mask = _rect_mask(h, w, *_random_rectangle(key, h, w, height_ratio,
                                               width_ratio))
    return noised * mask[None, :, :, None]


def cropout(key, noised, cover, height_ratio=(0.55, 0.6),
            width_ratio=(0.55, 0.6)):
    """Inside the rect keep noised, outside restore cover
    (cropout.py:16-28)."""
    _, h, w, _ = noised.shape
    mask = _rect_mask(h, w, *_random_rectangle(key, h, w, height_ratio,
                                               width_ratio))[None, :, :, None]
    return noised * mask + cover * (1.0 - mask)


def dropout(key, noised, cover, keep_ratio=(0.55, 0.6)):
    """Per-pixel Bernoulli blend noised<->cover (dropout.py:16-28); one
    spatial mask shared across batch/channels, like the reference."""
    kp, km = jax.random.split(key)
    p = _random_float(kp, *keep_ratio)
    _, h, w, _ = noised.shape
    mask = jax.random.bernoulli(km, p, (h, w)).astype(noised.dtype)
    mask = mask[None, :, :, None]
    return noised * mask + cover * (1.0 - mask)


def resize(key, noised, cover, resize_ratio=(0.7, 0.8)):
    """Nearest-neighbour resize by a random ratio (resize.py:16-26);
    static-shape variant resizes down and back up on the same canvas via a
    dynamic nearest gather."""
    del cover
    _, h, w, _ = noised.shape
    ratio = _random_float(key, *resize_ratio)
    # down-then-up nearest: src index = floor(floor(i*ratio) / ratio)
    rows = jnp.floor(jnp.floor(jnp.arange(h) * ratio) / ratio).astype(jnp.int32)
    cols = jnp.floor(jnp.floor(jnp.arange(w) * ratio) / ratio).astype(jnp.int32)
    rows = jnp.clip(rows, 0, h - 1)
    cols = jnp.clip(cols, 0, w - 1)
    return noised[:, rows][:, :, cols]


# Quantization (quantization.py:6-45)

_QN = 10
_Q_WEIGHTS = np.array([((-1) ** (n + 1)) / (np.pi * (n + 1))
                       for n in range(_QN)])
_Q_SCALES = np.array([2 * np.pi * (n + 1) for n in range(_QN)])


def _minmax_transform(x, lo, hi):
    xmin, xmax = x.min(), x.max()
    unit = (x - xmin) / (xmax - xmin)
    return unit * (hi - lo) + lo


def fourier_rounding(x):
    """x + sum_n w_n sin(s_n x): truncated Fourier series of the sawtooth,
    a smooth differentiable round (quantization.py:32-36)."""
    w = jnp.asarray(_Q_WEIGHTS, dtype=x.dtype).reshape((-1,) + (1,) * x.ndim)
    s = jnp.asarray(_Q_SCALES, dtype=x.dtype).reshape((-1,) + (1,) * x.ndim)
    return x + jnp.sum(w * jnp.sin(x[None] * s), axis=0)


def quantization(key, noised, cover):
    """Rescale to [0,255], Fourier-round, rescale back to the original
    min/max (quantization.py:39-45)."""
    del key, cover
    scaled = _minmax_transform(noised, 0.0, 255.0)
    rounded = fourier_rounding(jnp.clip(scaled, 0.0, 255.0))
    return _minmax_transform(rounded, noised.min(), noised.max())


# JPEG (jpeg_compression.py:6-160)

@functools.lru_cache(maxsize=4)
def _dct_mats(n: int = 8):
    """Orthonormality-matched DCT bases of the reference's gen_filters
    (jpeg_compression.py:42-48): forward C[k,t]=cos(pi/N (t+1/2) k),
    inverse with the 1/sqrt(2N) + DC-halving correction."""
    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    fwd = np.cos(np.pi / n * (t + 0.5) * k)              # (k, n)
    inv = ((t == 0) * (-0.5) + np.cos(np.pi / n * (k + 0.5) * t)) \
        * np.sqrt(1.0 / (2.0 * n))                        # (k_out=t?, ...)
    return fwd, inv


@functools.lru_cache(maxsize=4)
def _jpeg_masks(h: int, w: int, keep=(25, 9, 9)) -> np.ndarray:
    order = sorted(((x, y) for x in range(8) for y in range(8)),
                   key=lambda p: (p[0] + p[1],
                                  -p[1] if (p[0] + p[1]) % 2 else p[1]))
    masks = []
    for kc in keep:
        m = np.zeros((8, 8), dtype=np.float32)
        for i, j in order[:kc]:
            m[i, j] = 1.0
        masks.append(np.tile(m, (h // 8, w // 8))[:h, :w])
    return np.stack(masks, axis=-1)                      # (h, w, 3)


_RGB2YUV = np.array([[0.299, -0.14713, 0.615],
                     [0.587, -0.28886, -0.51499],
                     [0.114, 0.436, -0.10001]])          # (rgb_in, yuv_out)
_YUV2RGB = np.array([[1.0, 1.0, 1.0],
                     [0.0, -0.39465, 2.03211],
                     [1.13983, -0.58060, 0.0]])          # (yuv_in, rgb_out)


def _blockwise(x, mat_left, mat_right):
    """Apply y = L @ block @ R to every 8x8 block of (B, H, W, C)."""
    b, h, w, c = x.shape
    xb = x.reshape(b, h // 8, 8, w // 8, 8, c).transpose(0, 1, 3, 5, 2, 4)
    yb = jnp.einsum("ij,...jk,kl->...il", jnp.asarray(mat_left, x.dtype),
                    xb, jnp.asarray(mat_right, x.dtype))
    return yb.transpose(0, 1, 4, 2, 5, 3).reshape(b, h, w, c)


def jpeg_compression(key, noised, cover, yuv_keep_weights=(25, 9, 9)):
    """Differentiable JPEG (jpeg_compression.py:67-160): RGB->YUV (BT.601),
    8x8 block DCT, zigzag keep-mask per channel, IDCT, YUV->RGB. For
    1/2-channel inputs the luma mask (25 coeffs) applies channel-wise."""
    del key, cover
    b, h, w, c = noised.shape
    pad_h, pad_w = (-h) % 8, (-w) % 8
    x = jnp.pad(noised, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hh, ww = h + pad_h, w + pad_w

    rgb = c == 3
    if rgb:
        x = x @ jnp.asarray(_RGB2YUV, x.dtype)
        mask = jnp.asarray(_jpeg_masks(hh, ww, tuple(yuv_keep_weights)))
    else:
        mask = jnp.asarray(
            _jpeg_masks(hh, ww, (yuv_keep_weights[0],) * c))

    fwd, inv = _dct_mats(8)
    coeffs = _blockwise(x, fwd, fwd.T)
    coeffs = coeffs * mask
    # inv[j, n] = idct_coeff(n, j): y = inv @ C @ inv.T reconstructs
    # exactly (the -1/2 DC correction + sqrt(1/2N) matches the 2/N IDCT
    # scale, jpeg_compression.py:46-48)
    y = _blockwise(coeffs, inv, inv.T)
    if rgb:
        y = y @ jnp.asarray(_YUV2RGB, y.dtype)
    return y[:, :h, :w, :]


# ---------------------------------------------------------------------------
# Noiser: ONE random layer per call, incl. implicit Identity
# (noiser.py:13-31)
# ---------------------------------------------------------------------------

class Noiser:
    """Random per-batch dispatcher over a bank of noise layers. JAX design:
    the bank becomes ``lax.switch`` branches over a uniform random index,
    so it stays inside one compiled graph (vs. the reference's host-side
    np.random.choice)."""

    def __init__(self, layers: Sequence[Callable]):
        self.layers = [identity] + list(layers)

    def __call__(self, key, noised: jnp.ndarray,
                 cover: jnp.ndarray) -> jnp.ndarray:
        kpick, kapply = jax.random.split(key)
        idx = jax.random.randint(kpick, (), 0, len(self.layers))
        branches = [functools.partial(fn, kapply) for fn in self.layers]
        return jax.lax.switch(idx, branches, noised, cover)

    def valid_mask(self, key, shape) -> jnp.ndarray:
        """(h, w) 0/1 mask of the positions this key's draw keeps valid.

        Replays the same (kpick, kapply) split and branch pick as
        ``__call__``, so for a size-changing layer (crop — the one layer
        whose reference form returns a SMALLER tensor, crop.py:48-75) it
        reproduces the exact kept rectangle; every other layer is
        full-frame. Lets the bits-mode decoder pool only over content the
        reference decoder would have seen at all."""
        _, h, w, _ = shape
        kpick, kapply = jax.random.split(key)
        idx = jax.random.randint(kpick, (), 0, len(self.layers))

        def rect_branch(k, hr, wr):
            return _rect_mask(h, w, *_random_rectangle(k, h, w, hr, wr))

        branches = []
        for fn in self.layers:
            if isinstance(fn, functools.partial) and fn.func is crop:
                hr = fn.keywords["height_ratio"]
                wr = fn.keywords["width_ratio"]
                branches.append(functools.partial(rect_branch, kapply,
                                                  hr, wr))
            else:
                branches.append(lambda: jnp.ones((h, w), jnp.float32))
        return jax.lax.switch(idx, branches)


def parse_noise_config(config_str: str) -> Noiser:
    """Parse the reference's noise-layer DSL, e.g.
    ``'crop((0.2,0.25),(0.2,0.25))+dropout(0.55,0.6)+jpeg()+quant()'``
    (hidden/noise_argparser.py:12-107)."""
    import ast

    layers: list[Callable] = []
    if config_str.strip():
        for item in config_str.split("+"):
            item = item.strip()
            name, _, arg_s = item.partition("(")
            arg_s = "(" + arg_s if arg_s else "()"
            args = ast.literal_eval(arg_s) if arg_s != "()" else ()
            if not isinstance(args, tuple):
                args = (args,)
            name = name.strip().lower()
            if name == "crop":
                layers.append(functools.partial(
                    crop, height_ratio=args[0], width_ratio=args[1]))
            elif name == "cropout":
                layers.append(functools.partial(
                    cropout, height_ratio=args[0], width_ratio=args[1]))
            elif name == "dropout":
                layers.append(functools.partial(dropout, keep_ratio=args))
            elif name == "resize":
                layers.append(functools.partial(resize, resize_ratio=args))
            elif name in ("jpeg", "jpeg_compression"):
                layers.append(jpeg_compression)
            elif name in ("quant", "quantization"):
                layers.append(quantization)
            elif name == "identity":
                layers.append(identity)
            else:
                raise ValueError(f"unknown noise layer {name!r}")
    return Noiser(layers)
