"""Uformer building blocks (flax.linen), TPU-first.

Functional parity targets (reference: uformerWM/model.py):
  InputProj        model.py:810-829     conv3x3 + LeakyReLU -> tokens
  OutputProj       model.py:843-875     tokens -> conv3x3 image
  Downsample       model.py:759-782     conv4x4 stride2 on token grid
  Upsample         model.py:785-807     convT 2x2 stride2 on token grid
  LinearProjection model.py:450-476     linear qkv
  WindowAttention  model.py:481-575     W-MSA + relative position bias
  Mlp / LeFF       model.py:652-728     FFN variants
  window partition model.py:733-755     (B,H,W,C) <-> (B*nW, w*w, C)
  LeWinTransformerBlock model.py:879-1038  LN -> shift -> W-MSA(+modulator)
                                            -> residual -> LeFF residual
  BasicUformerLayer model.py:1043-1096  depth blocks, alternating shift

TPU-first notes
---------------
* Layout: activations are (B, H, W, C) images or (B, L, C) token sequences
  (row-major L = H*W). All convs are NHWC (lax native layout).
* Window partition / reverse are pure reshape+transpose — no gather.
* Shifted-window masks and the relative-position index are computed in
  numpy at trace time and baked as constants (shapes are static).
* Attention is einsum-based; the whole block fuses under jit. A Pallas
  fused window-attention kernel can be slotted into WindowAttention.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Parity with torch init: trunc_normal_(std=.02) for linear weights
# (model.py:2330-2336), zeros bias.
trunc_init = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, win*win, C). Pure reshape/transpose."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_reverse(windows: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, win*win, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // win // win)
    x = windows.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@functools.lru_cache(maxsize=32)
def relative_position_index(win_h: int, win_w: int) -> np.ndarray:
    """Swin-style pairwise relative position index (model.py:495-506).

    Returns (win_h*win_w, win_h*win_w) int32 indices into a
    ((2*win_h-1)*(2*win_w-1), heads) bias table.
    """
    coords = np.stack(np.meshgrid(np.arange(win_h), np.arange(win_w),
                                  indexing="ij"))          # 2, Wh, Ww
    flat = coords.reshape(2, -1)                            # 2, N
    rel = flat[:, :, None] - flat[:, None, :]               # 2, N, N
    rel = rel.transpose(1, 2, 0).copy()                     # N, N, 2
    rel[:, :, 0] += win_h - 1
    rel[:, :, 1] += win_w - 1
    rel[:, :, 0] *= 2 * win_w - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def shift_attn_mask(h: int, w: int, win: int, shift: int) -> np.ndarray:
    """SW-MSA attention mask (model.py:993-1010): (nW, N, N) float32 with
    0 / -100 entries, additive pre-softmax."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(h // win, win, w // win, win).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, win * win)                      # nW, N
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class InputProj(nn.Module):
    """conv3x3 + LeakyReLU, image -> tokens (model.py:810-829)."""

    out_channel: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = x.shape
        y = nn.Conv(self.out_channel, (3, 3), padding=1, dtype=self.dtype,
                    name="proj")(x)
        y = nn.leaky_relu(y, negative_slope=0.01)
        return y.reshape(b, h * w, self.out_channel)


class OutputProj(nn.Module):
    """tokens -> conv3x3 image (model.py:843-875)."""

    out_channel: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, l, c = x.shape
        assert l == h * w, (l, h, w)
        y = x.reshape(b, h, w, c)
        # final projection in f32 for output fidelity
        return nn.Conv(self.out_channel, (3, 3), padding=1,
                       dtype=jnp.float32, name="proj")(
                           y.astype(jnp.float32))


class Downsample(nn.Module):
    """conv4x4 stride2 pad1 on the token grid (model.py:759-782)."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, l, c = x.shape
        y = x.reshape(b, h, w, c)
        y = nn.Conv(self.out_channel, (4, 4), strides=2, padding=1,
                    dtype=self.dtype, name="conv")(y)
        return y.reshape(b, (h // 2) * (w // 2), self.out_channel)


class Upsample(nn.Module):
    """convT 2x2 stride2 on the token grid (model.py:785-807)."""

    out_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, l, c = x.shape
        y = x.reshape(b, h, w, c)
        y = nn.ConvTranspose(self.out_channel, (2, 2), strides=(2, 2),
                             dtype=self.dtype, name="deconv")(y)
        return y.reshape(b, (h * 2) * (w * 2), self.out_channel)


class Mlp(nn.Module):
    """fc -> GELU -> fc (model.py:652-683)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = self.out_dim or x.shape[-1]
        # exact erf-GELU in f32 (reference parity); tanh-GELU under bf16
        # (erfc lowers to a long f32 polynomial that dominates VPU time)
        approx = self.dtype == jnp.bfloat16
        y = nn.Dense(self.hidden_dim, kernel_init=trunc_init,
                     dtype=self.dtype, name="fc1")(x)
        y = nn.gelu(y, approximate=approx)
        return nn.Dense(out, kernel_init=trunc_init, dtype=self.dtype,
                        name="fc2")(y)


class LeFF(nn.Module):
    """Locally-enhanced FFN (model.py:686-728): linear+GELU -> depthwise
    3x3 on the restored HxW grid + GELU -> linear."""

    hidden_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
        b, l, c = x.shape
        approx = self.dtype == jnp.bfloat16   # see Mlp note
        y = nn.Dense(self.hidden_dim, kernel_init=trunc_init,
                     dtype=self.dtype, name="linear1")(x)
        y = nn.gelu(y, approximate=approx)
        y = y.reshape(b, h, w, self.hidden_dim)
        y = nn.Conv(self.hidden_dim, (3, 3), padding=1,
                    feature_group_count=self.hidden_dim, dtype=self.dtype,
                    name="dwconv")(y)
        y = nn.gelu(y, approximate=approx)
        y = y.reshape(b, l, self.hidden_dim)
        return nn.Dense(c, kernel_init=trunc_init, dtype=self.dtype,
                        name="linear2")(y)


class WindowAttention(nn.Module):
    """W-MSA over win*win tokens with learned relative-position bias
    (model.py:481-575). token_projection='linear' (the production config);
    'conv' (SepConv2d qkv, model.py:373-447) supported for parity."""

    dim: int
    win_size: tuple[int, int]
    num_heads: int
    qkv_bias: bool = True
    token_projection: str = "linear"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b_, n, c = x.shape
        heads = self.num_heads
        head_dim = c // heads
        scale = head_dim ** -0.5

        table = self.param(
            "relative_position_bias_table", trunc_init,
            ((2 * self.win_size[0] - 1) * (2 * self.win_size[1] - 1), heads),
        )
        idx = relative_position_index(*self.win_size)
        bias_nnh = table[idx.reshape(-1)].reshape(n, n, heads)
        bias_hnn = bias_nnh.transpose(2, 0, 1)           # (heads, N, N)

        if self.token_projection == "linear":
            wqkv = self.param("qkv_kernel", trunc_init, (c, 3 * c))
            bqkv = self.param("qkv_bias", nn.initializers.zeros,
                              (3 * c,)) if self.qkv_bias \
                else jnp.zeros((3 * c,), x.dtype)
            wproj = self.param("proj_kernel", trunc_init, (c, c))
            bproj = self.param("proj_bias", nn.initializers.zeros, (c,))

            if self.use_pallas:
                from image_in_speech_watermarking_tpu.ops import (
                    fused_window_attention)

                mask_f = mask.astype(jnp.float32) if mask is not None \
                    else jnp.zeros((1, n, n), jnp.float32)
                return fused_window_attention(
                    x, wqkv, bqkv, wproj, bproj,
                    bias_hnn.astype(jnp.float32), mask_f, heads)

            qkv = x @ wqkv.astype(x.dtype) + bqkv.astype(x.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:  # 'conv' qkv (SepConv2d, model.py:373-447)
            wh, ww = self.win_size
            img = x.reshape(b_, wh, ww, c)

            def sep_conv(name):
                y = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                            dtype=self.dtype, name=f"{name}_dw")(img)
                return nn.Conv(c, (1, 1), use_bias=self.qkv_bias,
                               dtype=self.dtype,
                               name=f"{name}_pw")(y).reshape(b_, n, c)

            q, k, v = sep_conv("to_q"), sep_conv("to_k"), sep_conv("to_v")
            wproj = self.param("proj_kernel", trunc_init, (c, c))
            bproj = self.param("proj_bias", nn.initializers.zeros, (c,))

        q = q.reshape(b_, n, heads, head_dim).transpose(0, 2, 1, 3) * scale
        k = k.reshape(b_, n, heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b_, n, heads, head_dim).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = attn + bias_hnn.astype(attn.dtype)[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, heads, n, n) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, heads, n, n)

        # softmax in f32 regardless of compute dtype
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(v.dtype)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return y @ wproj.astype(y.dtype) + bproj.astype(y.dtype)


class Attention(nn.Module):
    """Plain multi-head attention used by the cross-modulator path
    (model.py:578-647): q from tokens, k/v from ``attn_kv`` when given."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 attn_kv: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b_, n, c = x.shape
        h = self.num_heads
        d = c // h
        scale = d ** -0.5
        kv_src = x if attn_kv is None else jnp.broadcast_to(
            attn_kv[None], (b_,) + attn_kv.shape)
        m = kv_src.shape[1]
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=trunc_init,
                     dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * c, use_bias=self.qkv_bias, kernel_init=trunc_init,
                      dtype=self.dtype, name="to_kv")(kv_src)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b_, n, h, d).transpose(0, 2, 1, 3) * scale
        k = k.reshape(b_, m, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b_, m, h, d).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        y = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, kernel_init=trunc_init, dtype=self.dtype,
                        name="proj")(y)


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath used at model.py:1032)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
        return x * mask / keep


class LeWinTransformerBlock(nn.Module):
    """LayerNorm -> (cyclic shift) -> window partition -> (+modulator)
    -> W-MSA(+rel bias, shift mask) -> reverse -> residual -> FFN residual
    (model.py:879-1038). Input-mask path is dead in the reference
    (mask=None forced at model.py:943) and omitted."""

    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    win_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    token_projection: str = "linear"
    token_mlp: str = "leff"
    modulator: bool = False
    cross_modulator: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_block: bool = False

    def _fused_block(self, x, h, w, win, shift):
        """Whole-block fused Pallas path (ops/experimental/lewin_block.py): two
        kernels per block, each a single HBM pass. Reads the params the
        standard path created, so checkpoints are interchangeable."""
        from image_in_speech_watermarking_tpu.ops import (
            fused_lewin_attn, fused_lewin_leff, make_mod_band, pick_band)

        b, l, c = x.shape
        n = win * win
        dt = self.dtype
        p_n1 = self.get_variable("params", "norm1")
        p_at = self.get_variable("params", "attn")
        p_n2 = self.get_variable("params", "norm2")
        p_ml = self.get_variable("params", "mlp")
        table = p_at["relative_position_bias_table"]
        idx = relative_position_index(win, win)
        bias_hnn = table[idx.reshape(-1)].reshape(
            n, n, self.num_heads).transpose(2, 0, 1).astype(jnp.float32)
        band = pick_band(h, win, w, c)
        mod = self.get_variable("params", "modulator") \
            if self.modulator else None
        mod_band = make_mod_band(mod, win, w, band, c, jnp.float32)

        y = x.astype(dt).reshape(b, h, w, c)
        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None
        y = fused_lewin_attn(
            y, p_n1["scale"].astype(jnp.float32),
            p_n1["bias"].astype(jnp.float32), mod_band,
            p_at["qkv_kernel"].astype(dt),
            p_at.get("qkv_bias", jnp.zeros((3 * c,))).astype(jnp.float32),
            p_at["proj_kernel"].astype(dt),
            p_at["proj_bias"].astype(jnp.float32), bias_hnn, mask,
            self.num_heads, win)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        y = y.reshape(b, l, c)
        return fused_lewin_leff(
            y, p_n2["scale"].astype(jnp.float32),
            p_n2["bias"].astype(jnp.float32),
            p_ml["linear1"]["kernel"].astype(dt),
            p_ml["linear1"]["bias"].astype(jnp.float32),
            p_ml["dwconv"]["kernel"][:, :, 0].astype(dt),
            p_ml["dwconv"]["bias"].astype(jnp.float32),
            p_ml["linear2"]["kernel"].astype(dt),
            p_ml["linear2"]["bias"].astype(jnp.float32),
            h, w, dt == jnp.bfloat16).astype(x.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h, w = self.input_resolution
        win, shift = self.win_size, self.shift_size
        if min(h, w) <= win:          # model.py:912-914
            win, shift = min(h, w), 0
        b, l, c = x.shape
        assert l == h * w

        fused_ok = (
            self.use_pallas_block
            and self.token_projection == "linear"
            and self.token_mlp not in ("ffn", "mlp")
            and (deterministic or self.drop_path == 0.0)
            and not self.is_initializing()
            and self.has_variable("params", "attn"))

        if self.cross_modulator:
            # cross-attend tokens to a learned win^2 x dim embedding
            # (model.py:1011-1015; NOTE the reference feeds the UNNORMED
            # x to cross_attn — kept for exactness)
            cross_emb = self.param("cross_modulator", trunc_init,
                                   (win * win, self.dim))
            x_cross = nn.LayerNorm(dtype=jnp.float32, name="norm_cross")(x)
            del x_cross  # computed but unused upstream (model.py:1013)
            x = x + Attention(dim=self.dim, num_heads=self.num_heads,
                              qkv_bias=self.qkv_bias, dtype=self.dtype,
                              name="cross_attn")(x, attn_kv=cross_emb)

        if fused_ok:
            return self._fused_block(x, h, w, win, shift)

        shortcut = x
        # LayerNorm in f32 (dtype=f32 upcasts internally), output in the
        # block compute dtype
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        y = y.astype(self.dtype).reshape(b, h, w, c)

        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(shift_attn_mask(h, w, win, shift))
        else:
            mask = None

        wins = window_partition(y, win)                      # B*nW, N, C

        if self.modulator:
            mod = self.param("modulator", trunc_init, (win * win, self.dim))
            wmsa_in = wins + mod.astype(wins.dtype)          # model.py:1014-1016
        else:
            wmsa_in = wins

        attn_windows = WindowAttention(
            dim=self.dim, win_size=(win, win), num_heads=self.num_heads,
            qkv_bias=self.qkv_bias, token_projection=self.token_projection,
            dtype=self.dtype, use_pallas=self.use_pallas,
            name="attn")(wmsa_in, mask=mask)

        y = window_reverse(attn_windows, win, h, w)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        y = y.reshape(b, l, c)

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(y.astype(shortcut.dtype), deterministic)

        z = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        z = z.astype(self.dtype)
        hidden = int(self.dim * self.mlp_ratio)
        if self.token_mlp in ("ffn", "mlp"):
            z = Mlp(hidden_dim=hidden, dtype=self.dtype, name="mlp")(z)
        else:  # leff / fastleff share the math (model.py:43-87,686-728)
            z = LeFF(hidden_dim=hidden, dtype=self.dtype, name="mlp")(z, h, w)
        return x + dp(z, deterministic)


class BasicUformerLayer(nn.Module):
    """Stack of `depth` LeWin blocks, alternating shift 0 / win//2 when
    shift_flag (model.py:1043-1096)."""

    dim: int
    input_resolution: tuple[int, int]
    depth: int
    num_heads: int
    win_size: int = 8
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: Sequence[float] = ()
    token_projection: str = "linear"
    token_mlp: str = "leff"
    shift_flag: bool = True
    modulator: bool = False
    use_remat: bool = False
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    use_pallas_block: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        for i in range(self.depth):
            block = LeWinTransformerBlock(
                dim=self.dim, input_resolution=self.input_resolution,
                num_heads=self.num_heads, win_size=self.win_size,
                shift_size=0 if (not self.shift_flag or i % 2 == 0)
                else self.win_size // 2,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop_path=self.drop_path[i] if i < len(self.drop_path) else 0.0,
                token_projection=self.token_projection,
                token_mlp=self.token_mlp, modulator=self.modulator,
                dtype=self.dtype, use_pallas=self.use_pallas,
                use_pallas_block=self.use_pallas_block,
                name=f"blocks_{i}")
            if self.use_remat:
                x = nn.remat(lambda m, a: m(a, deterministic))(block, x)
            else:
                x = block(x, deterministic)
        return x


class ConvBNRelu(nn.Module):
    """conv3x3 -> BatchNorm -> ReLU (hidden/model/conv_bn_relu.py:3-18,
    uformerWM/model.py:1397-1412)."""

    channels_out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.Conv(self.channels_out, (3, 3), strides=self.stride,
                    padding=1, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(y)
        return nn.relu(y)


class SELayer(nn.Module):
    """Squeeze-excite channel attention (model.py:281-305)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = x.mean(axis=(1, 2))
        s = nn.relu(nn.Dense(c // self.reduction, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(c, name="fc2")(s))
        return x * s[:, None, None, :]


class ECALayer1d(nn.Module):
    """Efficient channel attention over tokens (model.py:339-371)."""

    k_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, L, C); attend over channel descriptor
        s = x.mean(axis=1)                                   # B, C
        s = nn.Conv(1, (self.k_size,), padding="SAME",
                    name="conv")(s[..., None])[..., 0]
        return x * nn.sigmoid(s)[:, None, :]
