"""Fused window-attention Pallas TPU kernel.

The W-MSA inner loop (uformerWM/model.py:523-551: qkv projection,
q·k^T + relative-position bias (+ shift mask), softmax, ·v, output
projection) is the bandwidth hot spot of the Uformer forward: at level 0
the (B·nW, heads, 64, 64) attention tensor alone is ~134 MB/block in f32,
and XLA materializes q/k/v/attn/attn@v round trips to HBM. This kernel
computes the whole chain per window-tile in VMEM — the attention matrix
never leaves the chip.

Grid: one program per image (tile = that image's nW windows), so the
shift mask indexes align with the tile rows. All matmuls run on the MXU
with f32 accumulation; softmax is computed in f32.

Gradients: ``fused_window_attention`` is a custom_vjp whose backward
replays the mathematically identical jnp reference (XLA handles the
transpose), so training works while the forward takes the fused path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reference_window_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                               num_heads: int):
    """Pure-jnp W-MSA core (numerics oracle; also the VJP path).

    x: (NW_total, N, C); wqkv: (C, 3C); wproj: (C, C);
    bias: (heads, N, N) f32; mask: (nW, N, N) f32 (zeros when unshifted).
    """
    nw_tot, n, c = x.shape
    h = num_heads
    d = c // h
    scale = d ** -0.5
    qkv = x @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
    qkv = qkv.reshape(nw_tot, n, 3, h, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * scale
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    attn = jnp.einsum("whnd,whmd->whnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None]
    nw = mask.shape[0]
    attn = attn + jnp.tile(mask, (nw_tot // nw, 1, 1))[:, None]
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
    y = jnp.einsum("whnm,whmd->whnd", attn, v)
    y = y.transpose(0, 2, 1, 3).reshape(nw_tot, n, c)
    return y @ wproj.astype(x.dtype) + bproj.astype(x.dtype)


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            mask_ref, out_ref, *, num_heads: int):
    # Mosaic's tpu.matmul supports at most ONE batch dimension, so the
    # head axis is a static python loop (heads <= 16); windows are the
    # batched matmul dimension.
    w, n, c = x_ref.shape
    h = num_heads
    d = c // h
    scale = d ** -0.5

    x = x_ref[:]                                        # (W, N, C)
    qkv = jax.lax.dot_general(
        x.reshape(w * n, c), wqkv_ref[:].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).reshape(w, n, 3 * c)

    mask = mask_ref[:]                                  # (W, N, N)
    heads_out = []
    for hh in range(h):
        qh = qkv[:, :, hh * d:(hh + 1) * d] * scale     # (W, N, d)
        kh = qkv[:, :, c + hh * d: c + (hh + 1) * d]
        vh = qkv[:, :, 2 * c + hh * d: 2 * c + (hh + 1) * d]
        attn = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (W, N, N)
        attn = attn + bias_ref[hh] + mask
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        p = jnp.exp(attn)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        yh = jax.lax.dot_general(
            p, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (W, N, d)
        heads_out.append(yh)
    y = heads_out[0] if h == 1 else jnp.concatenate(heads_out, axis=-1)

    out = jax.lax.dot_general(
        y.reshape(w * n, c).astype(x.dtype),
        wproj_ref[:].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + bproj_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(w, n, c).astype(out_ref.dtype)


_VMEM_BUDGET = 4 * 1024 * 1024  # conservative working-set cap per program


def _tile_windows(nw: int, n: int, c: int) -> int:
    """Largest divisor of nw whose per-program working set (~x + qkv + y
    + 2 live attention buffers) fits the VMEM budget."""
    def bytes_for(tw: int) -> int:
        return 4 * tw * n * (6 * c + 3 * n)
    tw = nw
    while tw > 1 and bytes_for(tw) > _VMEM_BUDGET:
        # next smaller divisor of nw
        tw -= 1
        while nw % tw:
            tw -= 1
    return tw


def pallas_window_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                            num_heads: int):
    """Fused forward. x: (NW_total, N, C) with NW_total a multiple of
    mask.shape[0] (= windows per image). Tiles are split below the image
    level when a full image's windows exceed the VMEM budget; the mask
    block index follows the within-image tile position."""
    nw_tot, n, c = x.shape
    nw = mask.shape[0]
    assert nw_tot % nw == 0
    tw = _tile_windows(nw, n, c)
    k = nw // tw                      # tiles per image
    grid = (nw_tot // tw,)
    h = num_heads

    flops = 2 * nw_tot * n * (3 * c * c + 2 * n * (c // h) * h + c * c)
    return pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tw, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, n, n), lambda i: (i % k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tw, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw_tot, n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=14 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=nw_tot * h * n * n),
    )(x, wqkv, bqkv, wproj, bproj, bias, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def fused_window_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                           num_heads: int):
    return pallas_window_attention(x, wqkv, bqkv, wproj, bproj, bias,
                                   mask, num_heads)


def _fwa_fwd(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads):
    out = pallas_window_attention(x, wqkv, bqkv, wproj, bproj, bias, mask,
                                  num_heads)
    return out, (x, wqkv, bqkv, wproj, bproj, bias, mask)


def _fwa_bwd(num_heads, res, g):
    x, wqkv, bqkv, wproj, bproj, bias, mask = res
    _, vjp = jax.vjp(
        lambda *a: reference_window_attention(*a, num_heads=num_heads),
        x, wqkv, bqkv, wproj, bproj, bias, mask)
    return vjp(g)


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)
