"""Whole-block fused LeWin kernels (ops/experimental/lewin_block.py) vs the standard
flax path.

The fused path reads the params the standard path created (identical
param tree), so the test inits once and applies both ways. Kernels run
in interpreter mode on the CPU test platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_in_speech_watermarking_tpu.models.layers import (
    LeWinTransformerBlock)
from image_in_speech_watermarking_tpu.ops.experimental import lewin_block

pytestmark = pytest.mark.slow  # Interpret-mode Pallas kernels (~4.5 min on 1 CPU)


@pytest.fixture(autouse=True)
def _interpret():
    lewin_block.INTERPRET = True
    yield
    lewin_block.INTERPRET = False


def _run_pair(h, w, c, heads, shift, modulator, dtype=jnp.float32,
              win=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, h * w, c)).astype(np.float32))
    kw = dict(dim=c, input_resolution=(h, w), num_heads=heads,
              win_size=win, shift_size=shift, modulator=modulator,
              token_mlp="leff", dtype=dtype)
    ref_blk = LeWinTransformerBlock(**kw)
    variables = ref_blk.init(jax.random.key(0), x)
    ref = ref_blk.apply(variables, x)
    fused_blk = LeWinTransformerBlock(use_pallas_block=True, **kw)
    out = fused_blk.apply(variables, x)
    return np.asarray(ref), np.asarray(out)


@pytest.mark.parametrize("h,w,c,heads,shift,modulator", [
    (16, 16, 32, 1, 0, False),      # level-0-like, unshifted
    (16, 16, 32, 1, 4, False),      # shifted (mask path)
    (16, 16, 64, 2, 4, True),       # modulator + shift
    (8, 8, 128, 4, 4, False),       # win==resolution -> shift forced 0
])
def test_fused_block_matches_standard(h, w, c, heads, shift, modulator):
    ref, out = _run_pair(h, w, c, heads, shift, modulator)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_fused_block_bf16_close_to_f32():
    ref, out = _run_pair(16, 16, 32, 1, 4, True, dtype=jnp.bfloat16)
    # bf16 matmuls: loose tolerance, but must track the same function
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.05)


def test_fused_block_gradients_flow():
    """custom_vjp backward replays the reference — grads must match the
    standard path."""
    h = w = 16
    c, heads = 32, 1
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, h * w, c)).astype(np.float32))
    kw = dict(dim=c, input_resolution=(h, w), num_heads=heads,
              win_size=8, shift_size=4, modulator=True, token_mlp="leff")
    blk = LeWinTransformerBlock(**kw)
    variables = blk.init(jax.random.key(0), x)
    fused_blk = LeWinTransformerBlock(use_pallas_block=True, **kw)

    def loss_ref(v):
        return jnp.sum(blk.apply(v, x) ** 2)

    def loss_fused(v):
        return jnp.sum(fused_blk.apply(v, x) ** 2)

    g_ref = jax.grad(loss_ref)(variables)
    g_fused = jax.grad(loss_fused)(variables)
    flat_r = jax.tree.leaves(g_ref)
    flat_f = jax.tree.leaves(g_fused)
    assert len(flat_r) == len(flat_f)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-3, atol=5e-4)


def test_leff_kernel_halo_exactness():
    """The halo DMA must make the depthwise 3x3 exact across band
    boundaries — compare against the XLA conv on a tall image."""
    h, w, c = 32, 128, 32
    hid = 4 * c
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, h * w, c)).astype(np.float32))
    args = [
        jnp.asarray(rng.standard_normal(c).astype(np.float32)),
        jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((c, hid)).astype(np.float32) * .05),
        jnp.asarray(rng.standard_normal(hid).astype(np.float32) * 0.01),
        jnp.asarray(rng.standard_normal((3, 3, hid)).astype(np.float32)
                    * 0.1),
        jnp.asarray(rng.standard_normal(hid).astype(np.float32) * 0.01),
        jnp.asarray(rng.standard_normal((hid, c)).astype(np.float32) * .05),
        jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.01),
    ]
    out = lewin_block.fused_lewin_leff(x, *args, h, w, False)
    ref = lewin_block._leff_reference(x, *args, h=h, w=w, approx_gelu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
