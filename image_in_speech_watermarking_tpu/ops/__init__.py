from image_in_speech_watermarking_tpu.ops.window_attention import (  # noqa: F401
    fused_window_attention, pallas_window_attention,
    reference_window_attention,
)
from image_in_speech_watermarking_tpu.ops.experimental.lewin_block import (  # noqa: F401
    fused_lewin_attn, fused_lewin_leff, make_mod_band, pick_band,
)
