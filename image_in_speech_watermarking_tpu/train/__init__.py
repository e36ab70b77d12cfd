from image_in_speech_watermarking_tpu.train.trainer import (  # noqa: F401
    Trainer, TrainState, make_optimizer, model_a_loss, uformer_loss,
)
from image_in_speech_watermarking_tpu.train import (  # noqa: F401
    checkpoint, schedulers,
)
