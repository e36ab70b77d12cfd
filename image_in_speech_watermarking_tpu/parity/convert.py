"""PyTorch reference state_dict -> flax variables weight-port.

Proves the north-star claim (BASELINE.md: "BER parity with the PyTorch
reference on identical clips") constructively: pour a reference
checkpoint's weights into the JAX models and assert the forwards match
per output-tuple element (tests/test_torch_parity.py, PARITY.md table).

Layout rules (verified numerically in tests/test_torch_parity.py):
  Conv2d          (O, I, kH, kW)  -> flax Conv kernel (kH, kW, I, O)
  ConvTranspose2d (I, O, kH, kW)  -> flax ConvTranspose kernel
                                     (kH, kW, I, O) with BOTH spatial
                                     axes flipped (torch convT is the
                                     conv gradient; flax applies the
                                     kernel as correlation)
  Linear          (O, I)          -> Dense kernel (I, O) = W.T
  LayerNorm/BatchNorm weight      -> scale; running stats -> batch_stats
  to_q + to_kv (model.py:450-476) -> packed qkv_kernel [q|k|v] columns
                                     (the reference packs kv as [k|v]
                                     heads-major — identical to our
                                     reshape(b, n, heads, head_dim))

Reference quirks honored:
  - `encoder.input_proj.*` params exist but are never used
    (Encoder.forward expects pre-projected tokens, model.py:1381-1394):
    skipped.
  - `attn.relative_position_index` is a buffer (recomputed on our side).
  - UformerAudio's decoder_wm == EncoderTransformerWM whose
    encoderlayer_*/dowsample_*/conv live under our
    `decoder_wm/encoder/*`, while its input_proj / conv2 head stay at
    `decoder_wm/*` (model.py:1428-1583).
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t2np(t) -> np.ndarray:
    return t.detach().cpu().numpy().astype(np.float32)


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight -> flax Conv kernel (grouped convs included:
    torch (O, I/g, kH, kW) -> flax (kH, kW, I/g, O))."""
    return np.transpose(w, (2, 3, 1, 0))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight -> flax ConvTranspose kernel."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


def _put(tree: dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# ----------------------------------------------------------------------
# UformerAudio / Uformer


def _flax_prefix(tprefix: str) -> str:
    """Translate a torch module prefix into our flax tree prefix."""
    p = tprefix
    # decoder_wm's encoder internals are nested under decoder_wm/encoder
    p = re.sub(r"^decoder_wm\.(encoderlayer_\d|dowsample_\d|conv)(?=\.|$)",
               r"decoder_wm.encoder.\1", p)
    p = re.sub(r"\.blocks\.(\d+)", r".blocks_\1", p)
    return p.replace(".", "/")


def _convert_lewin_block(npsd: Dict[str, np.ndarray], params: dict,
                         tprefix: str) -> None:
    """One LeWinTransformerBlock (model.py:879-1038) -> blocks_N subtree."""
    f = _flax_prefix(tprefix)
    for n in ("norm1", "norm2"):
        _put(params, f"{f}/{n}/scale", npsd[f"{tprefix}.{n}.weight"])
        _put(params, f"{f}/{n}/bias", npsd[f"{tprefix}.{n}.bias"])
    q_w = npsd[f"{tprefix}.attn.qkv.to_q.weight"]
    kv_w = npsd[f"{tprefix}.attn.qkv.to_kv.weight"]
    _put(params, f"{f}/attn/qkv_kernel",
         np.concatenate([linear_kernel(q_w), linear_kernel(kv_w)], axis=1))
    if f"{tprefix}.attn.qkv.to_q.bias" in npsd:
        _put(params, f"{f}/attn/qkv_bias",
             np.concatenate([npsd[f"{tprefix}.attn.qkv.to_q.bias"],
                             npsd[f"{tprefix}.attn.qkv.to_kv.bias"]]))
    _put(params, f"{f}/attn/proj_kernel",
         linear_kernel(npsd[f"{tprefix}.attn.proj.weight"]))
    _put(params, f"{f}/attn/proj_bias", npsd[f"{tprefix}.attn.proj.bias"])
    _put(params, f"{f}/attn/relative_position_bias_table",
         npsd[f"{tprefix}.attn.relative_position_bias_table"])
    if f"{tprefix}.modulator.weight" in npsd:
        _put(params, f"{f}/modulator", npsd[f"{tprefix}.modulator.weight"])
    if f"{tprefix}.mlp.linear1.0.weight" in npsd:      # LeFF
        for lin in ("linear1", "linear2"):
            _put(params, f"{f}/mlp/{lin}/kernel",
                 linear_kernel(npsd[f"{tprefix}.mlp.{lin}.0.weight"]))
            _put(params, f"{f}/mlp/{lin}/bias",
                 npsd[f"{tprefix}.mlp.{lin}.0.bias"])
        _put(params, f"{f}/mlp/dwconv/kernel",
             conv_kernel(npsd[f"{tprefix}.mlp.dwconv.0.weight"]))
        _put(params, f"{f}/mlp/dwconv/bias",
             npsd[f"{tprefix}.mlp.dwconv.0.bias"])
    else:                                              # Mlp (fc1/fc2)
        for tname, fname in (("fc1", "fc1"), ("fc2", "fc2")):
            _put(params, f"{f}/mlp/{fname}/kernel",
                 linear_kernel(npsd[f"{tprefix}.mlp.{tname}.weight"]))
            _put(params, f"{f}/mlp/{fname}/bias",
                 npsd[f"{tprefix}.mlp.{tname}.bias"])


def uformer_audio_variables(state_dict) -> dict:
    """Reference UformerAudio state_dict (model.py:2225-2543) -> flax
    ``{'params': ...}`` for models.uformer.UformerAudio."""
    npsd = {k: _t2np(v) for k, v in state_dict.items()}
    params: dict = {}

    block_prefixes = sorted({
        m.group(1)
        for k in npsd
        for m in [re.match(r"(.*\.blocks\.\d+)\.norm1\.weight$", k)]
        if m and not m.group(1).startswith("encoder.input_proj")})
    for bp in block_prefixes:
        _convert_lewin_block(npsd, params, bp)

    for k, v in npsd.items():
        if (k.startswith("encoder.input_proj.")       # unused in forward
                or ".blocks." in k
                or k.endswith("relative_position_index")
                or k.endswith("num_batches_tracked")):
            continue
        is_w = k.endswith(".weight")
        leaf = "kernel" if is_w else "bias"
        base = k.rsplit(".", 1)[0]
        if re.search(r"(upsample_\d\.deconv\.0|t_conv\d)$", base):
            val = deconv_kernel(v) if is_w else v
        else:
            val = conv_kernel(v) if is_w else v
        f = _flax_prefix(base)
        f = re.sub(r"/(proj|conv|deconv)/0$", r"/\1", f)
        f = re.sub(r"^stft_layer/(\d)$", r"stft_layer_\1", f)
        _put(params, f"{f}/{leaf}", val)

    return {"params": params}


uformer_variables = uformer_audio_variables   # same naming scheme


# ----------------------------------------------------------------------
# ModelA (model.py:3000-3066)

_MODELA_CONV = {
    "embedder_encoder.0": "emb_conv1", "embedder_encoder.4": "emb_conv2",
    "detector.0": "det_conv1", "detector.4": "det_conv2",
    "detector.8": "det_conv3",
}
_MODELA_DECONV = {
    "embedder_decoder.0": "dec_tconv1", "embedder_decoder.4": "dec_tconv2",
}
_MODELA_BN = {
    "embedder_encoder.1": "emb_bn1", "embedder_encoder.5": "emb_bn2",
    "embedder_decoder.1": "dec_bn1", "embedder_decoder.5": "dec_bn2",
    "detector.1": "det_bn1", "detector.5": "det_bn2",
}


def modela_variables(state_dict) -> dict:
    npsd = {k: _t2np(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    for t, f in _MODELA_CONV.items():
        _put(params, f"{f}/kernel", conv_kernel(npsd[f"{t}.weight"]))
        _put(params, f"{f}/bias", npsd[f"{t}.bias"])
    for t, f in _MODELA_DECONV.items():
        _put(params, f"{f}/kernel", deconv_kernel(npsd[f"{t}.weight"]))
        _put(params, f"{f}/bias", npsd[f"{t}.bias"])
    for t, f in _MODELA_BN.items():
        _put(params, f"{f}/scale", npsd[f"{t}.weight"])
        _put(params, f"{f}/bias", npsd[f"{t}.bias"])
        _put(stats, f"{f}/mean", npsd[f"{t}.running_mean"])
        _put(stats, f"{f}/var", npsd[f"{t}.running_var"])
    return {"params": params, "batch_stats": stats}


# ----------------------------------------------------------------------
# hidden Decoder (hidden/model/decoder.py:6-40)


def hidden_decoder_variables(state_dict, decoder_blocks: int = 7) -> dict:
    """Sequential index map: 0..blocks-1 ConvBNRelu(C) -> conv0..,
    [blocks] -> to_msg, [blocks+1] MaxPool, [blocks+2] -> to_one."""
    npsd = {k: _t2np(v) for k, v in state_dict.items()}
    params: dict = {}
    stats: dict = {}
    names = {i: f"conv{i}" for i in range(decoder_blocks)}
    names[decoder_blocks] = "to_msg"
    names[decoder_blocks + 2] = "to_one"
    for i, f in names.items():
        t = f"layers.{i}.layers"
        _put(params, f"{f}/conv/kernel", conv_kernel(npsd[f"{t}.0.weight"]))
        _put(params, f"{f}/conv/bias", npsd[f"{t}.0.bias"])
        _put(params, f"{f}/bn/scale", npsd[f"{t}.1.weight"])
        _put(params, f"{f}/bn/bias", npsd[f"{t}.1.bias"])
        _put(stats, f"{f}/bn/mean", npsd[f"{t}.1.running_mean"])
        _put(stats, f"{f}/bn/var", npsd[f"{t}.1.running_var"])
    return {"params": params, "batch_stats": stats}
