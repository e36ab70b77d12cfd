from image_in_speech_watermarking_tpu.eval import metrics  # noqa: F401
from image_in_speech_watermarking_tpu.eval.evaluate import (  # noqa: F401
    DEFAULT_ATTACKS, evaluate_model, evaluate_split,
)
from image_in_speech_watermarking_tpu.eval.pipeline import (  # noqa: F401
    UtteranceResult, reconstruct_audio,
)
from image_in_speech_watermarking_tpu.eval.result_extract import (  # noqa: F401
    process_data_to_csv,
)
from image_in_speech_watermarking_tpu.eval.hidden_pipeline import (  # noqa: F401
    HiddenUtteranceResult, reconstruct_audio_hidden,
)
from image_in_speech_watermarking_tpu.eval import image_metrics  # noqa: F401
from image_in_speech_watermarking_tpu.eval import submissions  # noqa: F401
