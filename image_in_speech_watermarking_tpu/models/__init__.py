from image_in_speech_watermarking_tpu.models.uformer import (  # noqa: F401
    UformerAudio, Uformer, UformerEncoder, UformerDecoder,
    ConvAutoencoder, EncoderTransformerWM, DecoderWM,
    DiscriminatorMark, DiscriminatorCover,
)
from image_in_speech_watermarking_tpu.models.baselines import (  # noqa: F401
    ModelA, UNet, ConvBlock,
)
from image_in_speech_watermarking_tpu.models.hidden import (  # noqa: F401
    HiddenEncoder, HiddenDecoder, HiddenDiscriminator, HiddenEncoderDecoder,
)
from image_in_speech_watermarking_tpu.models.registry import get_arch  # noqa: F401
from image_in_speech_watermarking_tpu.models.variants import (  # noqa: F401
    ConvAutoencoder2, UformerAudioMod, UformerAudioV2, UformerAudioV4,
)
from image_in_speech_watermarking_tpu.models.extras import (  # noqa: F401
    LPU, SAM, PosCNN,
)
from image_in_speech_watermarking_tpu.models.wm_network import (  # noqa: F401
    WMNetCNN, WMNetCNNAudio, WMNetCNNTF, spectral_loss,
)
