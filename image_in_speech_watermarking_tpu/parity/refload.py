"""Import the PyTorch reference models for numerical parity checks.

The north-star claim is "BER/forward parity with the PyTorch reference on
identical clips" (BASELINE.md). This module makes the reference
importable so tests can run it side by side with the JAX models:

  uformerWM/model.py        -> UformerAudio (model.py:2225-2543),
                               ModelA (model.py:3000-3066), Uformer, ...
  hidden/model/decoder.py   -> Decoder (decoder.py:6-40)

The reference imports two packages that are not installed here
(`timm.models.layers` for DropPath/to_2tuple/trunc_normal_ and
`torchsummary`); neither is exercised by the models we compare
(DropPath is identity at drop_path=0., the default; torchsummary is
only referenced in commented-out code), so minimal local stand-ins are
registered in sys.modules before the import.

Verification-only module: nothing here is part of the TPU runtime, and
no reference code is copied — the reference is imported from
/root/reference and executed as-is.
"""

from __future__ import annotations

import importlib.util
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _install_stub_modules() -> None:
    if "timm" in sys.modules and "torchsummary" in sys.modules:
        return
    import torch
    import torch.nn as tnn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a, b)
        return tensor

    class DropPath(tnn.Module):
        """Stochastic depth; identity in eval / at drop_prob=0 (the only
        configuration the watermarking models use)."""

        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")
    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = to_2tuple
    timm_layers.trunc_normal_ = trunc_normal_
    timm.models = timm_models
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    torchsummary = types.ModuleType("torchsummary")
    torchsummary.summary = lambda *a, **k: None
    sys.modules.setdefault("torchsummary", torchsummary)


def _import_from_path(name: str, path: str, extra_sys_path=()):
    if name in sys.modules:
        return sys.modules[name]
    saved = list(sys.path)
    sys.path[:0] = list(extra_sys_path)
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path[:] = saved


def load_uformer_model():
    """`uformerWM/model.py` as a module (UformerAudio, ModelA, ...)."""
    _install_stub_modules()
    return _import_from_path(
        "ref_uformer_model", f"{REFERENCE_ROOT}/uformerWM/model.py")


def load_hidden_models():
    """hidden's (options, ConvBNRelu, Decoder) — decoder.py imports
    `options` and `model.conv_bn_relu` relative to the hidden/ root."""
    _install_stub_modules()
    opts = _import_from_path(
        "options", f"{REFERENCE_ROOT}/hidden/options.py",
        extra_sys_path=[f"{REFERENCE_ROOT}/hidden"])
    _import_from_path(
        "model", f"{REFERENCE_ROOT}/hidden/model/__init__.py",
        extra_sys_path=[f"{REFERENCE_ROOT}/hidden"]) \
        if _has_init() else None
    dec = _import_from_path(
        "ref_hidden_decoder", f"{REFERENCE_ROOT}/hidden/model/decoder.py",
        extra_sys_path=[f"{REFERENCE_ROOT}/hidden"])
    return opts, dec


def _has_init() -> bool:
    import os
    return os.path.exists(f"{REFERENCE_ROOT}/hidden/model/__init__.py")


def reference_available() -> bool:
    import os
    return os.path.isdir(REFERENCE_ROOT)


class torch_stft_compat:
    """The reference targets the pre-1.8 real-format torch.stft/istft
    (model.py:2458-2463 passes/expects (..., 2) real/imag tensors and
    omits return_complex). Modern torch raises on both; this context
    manager patches torch.stft/torch.istft to the legacy convention so
    the reference forward runs unmodified."""

    def __enter__(self):
        import torch

        self._torch = torch
        self._stft, self._istft = torch.stft, torch.istft

        def stft(x, n_fft, *a, **kw):
            kw.setdefault("return_complex", True)
            return torch.view_as_real(self._stft(x, n_fft, *a, **kw))

        def istft(x, n_fft, *a, **kw):
            if not torch.is_complex(x):
                x = torch.view_as_complex(x.contiguous())
            return self._istft(x, n_fft, *a, **kw)

        torch.stft, torch.istft = stft, istft
        return self

    def __exit__(self, *exc):
        self._torch.stft = self._stft
        self._torch.istft = self._istft
        return False
