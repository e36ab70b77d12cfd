from image_in_speech_watermarking_tpu.attacks import (  # noqa: F401
    filters, host, noise_layers, waveform,
)
from image_in_speech_watermarking_tpu.attacks.waveform import (  # noqa: F401
    ATTACKS, get_attack,
)
from image_in_speech_watermarking_tpu.attacks.noise_layers import (  # noqa: F401
    Noiser, parse_noise_config,
)
