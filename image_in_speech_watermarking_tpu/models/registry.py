"""Arch-name -> model factory, mirroring ``get_arch``
(uformerWM/utils/model_utils.py:60-108). The reference dispatches 11 arch
strings; the production one is ``Uformer_audio`` (model_utils.py:84-85)."""

from __future__ import annotations

import dataclasses

from image_in_speech_watermarking_tpu.config import UformerConfig, stock_uformer
from image_in_speech_watermarking_tpu.models import baselines, uformer


def get_arch(arch: str, train_ps: int = 128, embed_dim: int = 32,
             win_size: int = 8, token_projection: str = "linear",
             token_mlp: str = "leff", dd_in: int = 2,
             compute_dtype: str = "float32", **kw):
    """Build a model by reference arch name (model_utils.py:60-108)."""
    if arch == "Uformer_audio":
        cfg = UformerConfig(
            img_size=train_ps, embed_dim=embed_dim, win_size=win_size,
            token_projection=token_projection, token_mlp=token_mlp,
            dd_in=dd_in, in_chans=dd_in,
            depths=(1, 2, 8, 8, 2, 8, 8, 2, 1), modulator=True,
            compute_dtype=compute_dtype,
            stft_residual=kw.pop("stft_residual", True),
            extractor_mag=kw.pop("extractor_mag", False),
            use_pallas_attention=kw.pop("use_pallas_attention", False),
            use_pallas_block=kw.pop("use_pallas_block", False))
        return uformer.UformerAudio(cfg, **kw)
    if arch == "ModelA":
        return baselines.ModelA()
    if arch in ("WMNetCNN", "WMNetCNNTF", "WMNetCNNAudio"):
        from image_in_speech_watermarking_tpu.models import wm_network
        return getattr(wm_network, arch)()
    if arch == "UNet":
        return baselines.UNet(dim=embed_dim)
    if arch == "Uformer":  # model_utils.py:62-64 (depths all 2)
        cfg = dataclasses.replace(
            stock_uformer(img_size=train_ps, embed_dim=embed_dim),
            win_size=win_size, token_projection=token_projection,
            token_mlp=token_mlp)
        return uformer.Uformer(cfg)
    if arch in ("Uformer_T", "Uformer_S", "Uformer_S_noshift",
                "Uformer_B_fastleff", "Uformer_B"):
        # model_utils.py:66-82 — Tiny/Small/Base image-restoration presets
        preset = {
            "Uformer_T": dict(embed_dim=16, token_mlp="leff"),
            "Uformer_S": dict(embed_dim=32, token_mlp="leff"),
            "Uformer_S_noshift": dict(embed_dim=32, token_mlp="leff",
                                      shift_flag=False),
            "Uformer_B_fastleff": dict(embed_dim=32, token_mlp="fastleff",
                                       depths=(1, 2, 8, 8, 2, 8, 8, 2, 1)),
            "Uformer_B": dict(embed_dim=32, token_mlp="leff",
                              depths=(1, 2, 8, 8, 2, 8, 8, 2, 1),
                              modulator=True),
        }[arch]
        cfg = dataclasses.replace(stock_uformer(img_size=train_ps),
                                  win_size=win_size, **preset)
        return uformer.Uformer(cfg)
    raise ValueError(f"unknown arch: {arch!r}")
