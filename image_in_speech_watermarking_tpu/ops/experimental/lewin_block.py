"""Whole-block fused LeWin kernels (Pallas TPU).

The LeWin transformer block (uformerWM/model.py:879-1038) is two
residual sub-blocks:

  A)  x = x + proj(W-MSA(partition(LN1(x)) + modulator))
  B)  x = x + fc2(gelu(dwconv3x3(gelu(fc1(LN2(x))))))        (LeFF)

Under XLA each sub-block round-trips the token stream through HBM
several times (LN, qkv, attention, proj, residual; fc1, dwconv, fc2,
residual).  These kernels compute each sub-block in ONE pass: a grid
program owns a row-band of the image, streams it into VMEM, runs the
whole chain with f32 accumulation on the MXU, and writes the residual
sum back — LN statistics, attention probabilities and the LeFF hidden
state never leave the chip.

Shift handling: a cyclic roll commutes with LayerNorm (per-token) and
with the residual add, so shifted blocks call the same kernel on the
pre-rolled array and un-roll the result (model.py:954-1012 semantics,
with the shift mask passed per window row-band).

Grid: (batch, H // band) with band a multiple of win so the shift-mask
block index lines up with the band's windows.  The LeFF kernel DMAs one
halo row above/below the band (zero at image edges) so the depthwise
3x3 convolution is exact across band boundaries.

Gradients: both public entry points are custom_vjp whose backward
replays the mathematically identical jnp reference; the fused forward
serves eval/bench/serve (and the fwd pass of training steps that keep
drop_path at 0).

STATUS (round 2, measured on a real v5e chip): PARKED, off by default.
The kernels are numerically verified in interpret mode (tests), but on
hardware Mosaic rejects the LeFF kernel's halo DMA — "Slice shape along
dimension 3 must be aligned to tiling (128), but is 32": the level-0
channel axis (embed_dim 32) is narrower than the 128-lane tile, so the
sliced halo copy is unaligned. Making it compile needs the channel axis
padded/folded to the lane tiling (e.g. (tokens, 32)->(tokens/4, 128)
window packing) — roadmap work. Until then XLA's fusion is the
production path (76 ms bf16 fwd at batch 32; no fused-kernel perf claim
is made anywhere).

ROUND-3 FINAL NEGATIVE (real v5e, scripts/bench_pallas_ab.py): the
packed-lane rework (lane-packed LeFF halo DMA, commit 908f83d) moves
the reject one op downstream — Mosaic "infer-vector-layout: unsupported
shape cast" on the un-pack transpose
    tpu.reshape (18x32x128xbf16) -> (18x128x32xbf16)
i.e. the sublane<->lane swap needed to restore token-major layout after
the packed matmul has no supported layout inference on this toolchain.
With both the direct and packed forms rejected by the compiler, the
kernels move to ops/experimental/ (flags still resolve here); XLA
fusion remains the production path and carries the bench headline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6  # flax LayerNorm default

# set True in CPU tests to run kernels through the interpreter
INTERPRET = False


def _layernorm(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + _EPS)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


# =====================================================================
# A) fused  LN1 -> (+modulator) -> W-MSA -> proj -> +residual
# =====================================================================


def _attn_kernel(x_ref, lns_ref, lnb_ref, mod_ref, wqkv_ref, bqkv_ref,
                 wproj_ref, bproj_ref, bias_ref, mask_ref, out_ref, *,
                 num_heads: int, win: int, has_mask: bool):
    _, band, w, c = x_ref.shape
    n = win * win
    nw = w // win
    kb = band // win                     # window rows in this band
    h = num_heads
    d = c // h
    scale = d ** -0.5

    x = x_ref[0]                                          # (band, W, C)
    y = _layernorm(x.reshape(band * w, c), lns_ref[:], lnb_ref[:])
    y = y + mod_ref[:].astype(jnp.float32)                # (band*W, C)
    compute_dtype = x.dtype
    qkv = jax.lax.dot_general(
        y.astype(compute_dtype), wqkv_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)           # (band*W, 3C)
    # partition into windows: (kb, win, nw, win, 3C) -> (kb*nw, N, 3C)
    qkv = qkv.reshape(kb, win, nw, win, 3 * c)
    qkv = qkv.transpose(0, 2, 1, 3, 4).reshape(kb * nw, n, 3 * c)

    mask = mask_ref[:] if has_mask else None              # (kb*nw, N, N)
    heads_out = []
    for hh in range(h):
        qh = qkv[:, :, hh * d:(hh + 1) * d] * scale
        kh = qkv[:, :, c + hh * d: c + (hh + 1) * d]
        vh = qkv[:, :, 2 * c + hh * d: 2 * c + (hh + 1) * d]
        attn = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (kb*nw, N, N)
        attn = attn + bias_ref[hh].astype(jnp.float32)
        if has_mask:
            attn = attn + mask.astype(jnp.float32)
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        p = jnp.exp(attn)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        yh = jax.lax.dot_general(
            p.astype(compute_dtype), vh.astype(compute_dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # (kb*nw, N, d)
        heads_out.append(yh)
    att = heads_out[0] if h == 1 else jnp.concatenate(heads_out, axis=-1)

    out = jax.lax.dot_general(
        att.reshape(kb * nw * n, c).astype(compute_dtype), wproj_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + bproj_ref[:].astype(jnp.float32)
    # reverse partition: (kb, nw, win, win, C) -> (band, W, C)
    out = out.reshape(kb, nw, win, win, c).transpose(0, 2, 1, 3, 4)
    out = out.reshape(band, w, c)
    out_ref[0] = (x.astype(jnp.float32) + out).astype(out_ref.dtype)


def _pick_band(hh: int, win: int, w: int, c: int) -> int:
    """Row-band height: multiple of win whose working set stays well
    under VMEM (x + qkv + 2 attention buffers + out, f32)."""
    band = hh
    n = win * win

    def bytes_for(b):
        nw = (b // win) * (w // win)
        return 4 * (2 * b * w * c + 4 * b * w * c + 2 * nw * n * n)

    while band > win and bytes_for(band) > 6 * 1024 * 1024:
        band //= 2
    while band % win:
        band += 1
    return band


def _attn_call(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias, mask,
               num_heads: int, win: int, interpret: bool = None):
    if interpret is None:
        interpret = INTERPRET
    b, hh, w, c = x.shape
    band = _pick_band(hh, win, w, c)
    n = win * win
    nwb = (band // win) * (w // win)       # windows per band
    grid = (b, hh // band)
    has_mask = mask is not None
    if not has_mask:
        mask = jnp.zeros((1, n, n), x.dtype)
    mask_block = (nwb, n, n) if has_mask else (1, n, n)
    mask_map = (lambda i, j: (j, 0, 0)) if has_mask \
        else (lambda i, j: (0, 0, 0))
    flops = 2 * b * hh * w * (4 * c * c + 2 * n * c)
    kwargs = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * hh * w * n))
    return pl.pallas_call(
        functools.partial(_attn_kernel, num_heads=num_heads, win=win,
                          has_mask=has_mask),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, band, w, c), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((band * w, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, n, n), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(mask_block, mask_map,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        **kwargs,
    )(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias, mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_lewin_attn(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias,
                     mask, num_heads: int, win: int):
    """x: (B, H, W, C), pre-rolled when shifted. mod: the modulator
    already expanded to a (band*W, C) tile via ``make_mod_band`` (zeros
    when the block has none). mask: (nW_img, N, N) f32 additive shift
    mask (zeros when unshifted). Returns x + attn_subblock(x)."""
    return _attn_call(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias,
                      mask, num_heads, win)


def _fla_fwd(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias, mask,
             num_heads, win):
    out = _attn_call(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias,
                     mask, num_heads, win)
    return out, (x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias, mask)


def _fla_bwd(num_heads, win, res, g):
    x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias, mask = res
    _, vjp = jax.vjp(
        lambda *a: _attn_reference_banded(*a, num_heads=num_heads,
                                          win=win),
        x, lns, lnb, mod, wqkv, bqkv, wproj, bproj, bias, mask)
    return vjp(g)


fused_lewin_attn.defvjp(_fla_fwd, _fla_bwd)


def _attn_reference_banded(x, lns, lnb, mod, wqkv, bqkv, wproj, bproj,
                           bias, mask, num_heads: int, win: int):
    """Reference with mod given as an expanded (band*W, C) tile whose row
    pattern repeats every win rows (exactly what the kernel consumes)."""
    b, hh, w, c = x.shape
    band = mod.shape[0] // w
    y = _layernorm(x.reshape(-1, c), lns, lnb).reshape(b, hh, w, c)
    mod_img = jnp.tile(mod.reshape(band, w, c), (hh // band, 1, 1))
    y = (y + mod_img[None].astype(jnp.float32)).astype(x.dtype)
    y = y.reshape(b, hh // win, win, w // win, win, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win, c)
    h = num_heads
    d = c // h
    n = win * win
    scale = d ** -0.5
    qkv = y @ wqkv.astype(y.dtype) + bqkv.astype(y.dtype)
    nw_tot = y.shape[0]
    qkv = qkv.reshape(nw_tot, n, 3, h, d)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3) * scale
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    attn = jnp.einsum("whnd,whmd->whnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias.astype(jnp.float32)[None]
    if mask is not None:
        nw_img = (hh // win) * (w // win)
        attn = attn.reshape(b, nw_img, h, n, n) \
            + mask.astype(jnp.float32)[None, :, None]
        attn = attn.reshape(nw_tot, h, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    yh = jnp.einsum("whnm,whmd->whnd", attn.astype(v.dtype), v)
    yh = yh.transpose(0, 2, 1, 3).reshape(nw_tot, n, c)
    out = yh @ wproj.astype(yh.dtype) + bproj.astype(yh.dtype)
    out = out.reshape(b, hh // win, w // win, win, win, c)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, w, c)
    return x + out.astype(x.dtype)


def pick_band(h: int, win: int, w: int, c: int) -> int:
    """Public band chooser (callers expand the modulator to this)."""
    return _pick_band(h, win, w, c)


def make_mod_band(mod, win: int, w: int, band: int, c: int,
                  dtype) -> jnp.ndarray:
    """Expand a (N, C) per-window-position modulator (or None) to the
    (band*W, C) tile the kernel adds after LN."""
    if mod is None:
        return jnp.zeros((band * w, c), dtype)
    tile = mod.reshape(win, win, c)
    tile = jnp.tile(tile, (band // win, w // win, 1))
    return tile.reshape(band * w, c).astype(dtype)


# =====================================================================
# B) fused  LN2 -> LeFF (fc1 -> gelu -> dw3x3 -> gelu -> fc2) -> +res
# =====================================================================


def _leff_kernel(x_any, lns_ref, lnb_ref, w1_ref, b1_ref, wdw_ref,
                 bdw_ref, w2_ref, b2_ref, out_ref, xs, sem, *,
                 band: int, w: int, c: int, approx_gelu: bool):
    bi = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    # x_any is LANE-PACKED (b, H, w*c//128, 128): the round-2 Mosaic
    # reject was the halo DMA's 32-wide lane axis ("slice shape along
    # dimension 3 must be aligned to tiling (128)"); folding 128//c
    # consecutive tokens into the lane axis makes every manual DMA
    # 128-lane aligned, and the (g,128)->(w,c) unpack happens in VMEM.
    g = x_any.shape[2]
    hid = w1_ref.shape[1]

    # ---- halo DMA: rows [j*band-1, (j+1)*band] clamped, zeros at edges
    pltpu.make_async_copy(
        x_any.at[bi, pl.ds(j * band, band)], xs.at[pl.ds(1, band)],
        sem.at[0]).start()

    @pl.when(j > 0)
    def _():
        pltpu.make_async_copy(
            x_any.at[bi, pl.ds(j * band - 1, 1)], xs.at[pl.ds(0, 1)],
            sem.at[1]).start()

    @pl.when(j == 0)
    def _():
        xs[0:1] = jnp.zeros((1, g, 128), xs.dtype)

    @pl.when(j < nj - 1)
    def _():
        pltpu.make_async_copy(
            x_any.at[bi, pl.ds((j + 1) * band, 1)],
            xs.at[pl.ds(band + 1, 1)], sem.at[2]).start()

    @pl.when(j == nj - 1)
    def _():
        xs[band + 1:band + 2] = jnp.zeros((1, g, 128), xs.dtype)

    pltpu.make_async_copy(x_any.at[bi, pl.ds(j * band, band)],
                          xs.at[pl.ds(1, band)], sem.at[0]).wait()

    @pl.when(j > 0)
    def _():
        pltpu.make_async_copy(x_any.at[bi, pl.ds(j * band - 1, 1)],
                              xs.at[pl.ds(0, 1)], sem.at[1]).wait()

    @pl.when(j < nj - 1)
    def _():
        pltpu.make_async_copy(x_any.at[bi, pl.ds((j + 1) * band, 1)],
                              xs.at[pl.ds(band + 1, 1)], sem.at[2]).wait()

    x = xs[:].reshape(band + 2, w, c)             # VMEM lane unpack
    compute_dtype = x.dtype
    y = _layernorm(x.reshape((band + 2) * w, c), lns_ref[:], lnb_ref[:])
    h1 = jax.lax.dot_general(
        y.astype(compute_dtype), w1_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[:].astype(jnp.float32)
    h1 = jax.nn.gelu(h1, approximate=approx_gelu).astype(compute_dtype)
    h1 = h1.reshape(band + 2, w, hid)
    # conv zero-padding happens in HIDDEN space: at image edges the halo
    # row must be zero post-fc1 (a zero x row would LN->bias -> nonzero)
    rows = jax.lax.broadcasted_iota(jnp.int32, (band + 2, 1, 1), 0)
    edge = ((rows == 0) & (j == 0)) | \
        ((rows == band + 1) & (j == nj - 1))
    h1 = jnp.where(edge, jnp.zeros_like(h1), h1)
    hp = jnp.pad(h1, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((band, w, hid), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            acc = acc + (hp[dr:dr + band, dc:dc + w, :]
                         * wdw_ref[dr, dc]).astype(jnp.float32)
    acc = acc + bdw_ref[:].astype(jnp.float32)
    acc = jax.nn.gelu(acc, approximate=approx_gelu)
    out = jax.lax.dot_general(
        acc.reshape(band * w, hid).astype(compute_dtype), w2_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out = out + b2_ref[:].astype(jnp.float32)
    res = x[1:band + 1].reshape(band * w, c).astype(jnp.float32)
    out_ref[0] = (res + out).reshape(band, w, c).astype(out_ref.dtype)


def _leff_call(x, lns, lnb, w1, b1, wdw, bdw, w2, b2, *, h: int, w: int,
               approx_gelu: bool, interpret: bool = None):
    if interpret is None:
        interpret = INTERPRET
    b, l, c = x.shape
    hid = w1.shape[1]
    band = h
    while band > 8 and (band + 2) * w * hid * 4 * 3 > 6 * 1024 * 1024:
        band //= 2
    # lane-pack the token rows: (h, w, c) -> (h, w*c//128, 128) so the
    # manual halo DMAs are 128-lane aligned (see kernel comment)
    assert (w * c) % 128 == 0, (w, c)
    g = (w * c) // 128
    ximg = x.reshape(b, h, g, 128)
    grid = (b, h // band)
    kwargs = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * (2 * c * hid + 9 * hid),
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=2 * b * l * hid))
    out = pl.pallas_call(
        functools.partial(_leff_kernel, band=band, w=w, c=c,
                          approx_gelu=approx_gelu),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hid), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, hid), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid,), lambda i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, band, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((band + 2, g, 128), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
        **kwargs,
    )(ximg, lns, lnb, w1, b1, wdw, bdw, w2, b2)
    return out.reshape(b, l, c)


def _leff_reference(x, lns, lnb, w1, b1, wdw, bdw, w2, b2, *, h: int,
                    w: int, approx_gelu: bool):
    b, l, c = x.shape
    hid = w1.shape[1]
    y = _layernorm(x, lns, lnb).astype(x.dtype)
    y = y @ w1.astype(y.dtype) + b1.astype(y.dtype)
    y = jax.nn.gelu(y, approximate=approx_gelu)
    y = y.reshape(b, h, w, hid)
    y = jax.lax.conv_general_dilated(
        y, wdw[:, :, None].astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=hid) + bdw.astype(y.dtype)
    y = jax.nn.gelu(y, approximate=approx_gelu)
    y = y.reshape(b, l, hid)
    y = y @ w2.astype(y.dtype) + b2.astype(y.dtype)
    return x + y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def fused_lewin_leff(x, lns, lnb, w1, b1, wdw, bdw, w2, b2, h: int,
                     w: int, approx_gelu: bool):
    """x: (B, L, C) tokens. wdw: (3, 3, hidden) depthwise taps.
    Returns x + LeFF(LN(x)) (model.py:686-728)."""
    return _leff_call(x, lns, lnb, w1, b1, wdw, bdw, w2, b2, h=h, w=w,
                      approx_gelu=approx_gelu)


def _fll_fwd(x, lns, lnb, w1, b1, wdw, bdw, w2, b2, h, w, approx_gelu):
    out = _leff_call(x, lns, lnb, w1, b1, wdw, bdw, w2, b2, h=h, w=w,
                     approx_gelu=approx_gelu)
    return out, (x, lns, lnb, w1, b1, wdw, bdw, w2, b2)


def _fll_bwd(h, w, approx_gelu, res, g):
    x, lns, lnb, w1, b1, wdw, bdw, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _leff_reference(*a, h=h, w=w, approx_gelu=approx_gelu),
        x, lns, lnb, w1, b1, wdw, bdw, w2, b2)
    return vjp(g)


fused_lewin_leff.defvjp(_fll_fwd, _fll_bwd)
