"""Pallas fused window-attention kernel vs the jnp reference math.

On the CPU test platform the kernel runs in interpreter mode; the real
device path is exercised by bench/verification on TPU."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu.models.layers import (
    WindowAttention, shift_attn_mask)
from image_in_speech_watermarking_tpu.ops import window_attention as wa


def _setup(nw=4, b=2, n=64, c=32, heads=1, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b * nw, n, c)).astype(np.float32))
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)).astype(np.float32)
                       * 0.05)
    bqkv = jnp.asarray(rng.standard_normal(3 * c).astype(np.float32) * 0.01)
    wproj = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32)
                        * 0.05)
    bproj = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)).astype(np.float32)
                       * 0.02)
    mask = jnp.asarray(shift_attn_mask(16, 16, 8, 4))  # (4, 64, 64)
    return x, wqkv, bqkv, wproj, bproj, bias, mask


def _pallas_interpret(*args, num_heads):
    """Run the kernel body in interpreter mode (no TPU in CI)."""
    from jax.experimental import pallas as pl

    x, wqkv, bqkv, wproj, bproj, bias, mask = args
    nw_tot, n, c = x.shape
    nw = mask.shape[0]
    return pl.pallas_call(
        functools.partial(wa._kernel, num_heads=num_heads),
        grid=(nw_tot // nw,),
        in_specs=[
            pl.BlockSpec((nw, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c,), lambda i: (0,)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((num_heads, n, n), lambda i: (0, 0, 0)),
            pl.BlockSpec((nw, n, n), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nw, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nw_tot, n, c), x.dtype),
        interpret=True,
    )(*args)


@pytest.mark.parametrize("heads,c", [(1, 32), (2, 64), (4, 128)])
def test_kernel_matches_reference(heads, c):
    args = _setup(c=c, heads=heads)
    ref = wa.reference_window_attention(*args, num_heads=heads)
    out = _pallas_interpret(*args, num_heads=heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_custom_vjp_grads_match_reference(monkeypatch):
    """Grad through fused_window_attention (pallas fwd interpreted, bwd
    replays the reference VJP) equals grad through the pure reference."""
    monkeypatch.setattr(wa, "pallas_window_attention", _dispatch_interpret)
    args = _setup()
    ref_fn = lambda *a: jnp.sum(
        wa.reference_window_attention(*a, num_heads=1) ** 2)
    fused_fn = lambda *a: jnp.sum(
        wa.fused_window_attention(*a, 1) ** 2)
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 3))(*args)
    g_fused = jax.grad(fused_fn, argnums=(0, 1, 3))(*args)
    for a, b in zip(g_ref, g_fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_layer_pallas_flag_matches_einsum_path():
    """WindowAttention(use_pallas=True) shares params with the einsum path
    and produces the same output (interpret-mode pallas on CPU)."""
    import image_in_speech_watermarking_tpu.ops.window_attention as wmod

    orig = wmod.pallas_window_attention
    wmod.pallas_window_attention = functools.partial(
        _dispatch_interpret)
    try:
        layer_ref = WindowAttention(dim=32, win_size=(8, 8), num_heads=1,
                                    use_pallas=False)
        layer_pal = WindowAttention(dim=32, win_size=(8, 8), num_heads=1,
                                    use_pallas=True)
        x = jax.random.normal(jax.random.key(0), (8, 64, 32))
        mask = jnp.asarray(shift_attn_mask(16, 16, 8, 4))
        p = layer_ref.init(jax.random.key(1), x, mask)
        out_ref = layer_ref.apply(p, x, mask)
        out_pal = layer_pal.apply(p, x, mask)
        np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                                   atol=2e-5, rtol=1e-4)
    finally:
        wmod.pallas_window_attention = orig


def _dispatch_interpret(x, wqkv, bqkv, wproj, bproj, bias, mask, num_heads):
    return _pallas_interpret(x, wqkv, bqkv, wproj, bproj, bias, mask,
                             num_heads=num_heads)
