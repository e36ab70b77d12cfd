from image_in_speech_watermarking_tpu.data.speech import (  # noqa: F401
    SpeechDataset, load_corpus, normalize_batch, synthetic_speech,
    wave_to_audio_clips, wave_to_eval_clips, wave_to_train_clips,
)
from image_in_speech_watermarking_tpu.data.watermark import (  # noqa: F401
    binary_watermarks, digit_watermarks, watermark_stream,
)
