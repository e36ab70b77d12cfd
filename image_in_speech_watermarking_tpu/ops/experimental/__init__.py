"""Experimental Pallas kernels: numerically verified (interpret-mode
tests) but NOT production paths — each carries a measured negative
result on real v5e hardware in its module docstring. Kept as an attic
so the production tree has no dead fast-path (opt-in flags still
resolve here and raise/compile as documented)."""

from image_in_speech_watermarking_tpu.ops.experimental.lewin_block import (  # noqa: F401
    fused_lewin_attn, fused_lewin_leff, make_mod_band, pick_band,
)
