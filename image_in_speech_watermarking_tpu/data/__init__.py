from image_in_speech_watermarking_tpu.data.speech import (  # noqa: F401
    SpeechDataset, frequency_masking, load_corpus, normalize_batch,
    synthetic_speech, synthetic_speech_hard, wave_to_audio_clips,
    wave_to_eval_clips, wave_to_train_clips,
)
from image_in_speech_watermarking_tpu.data.watermark import (  # noqa: F401
    binary_watermarks, bit_messages, digit_watermarks, pilot_pattern,
    stamp_pilot, watermark_stream,
)
from image_in_speech_watermarking_tpu.data.legacy_audio import (  # noqa: F401
    AudioMark, AudioMarkAll, align_audio_len, gen_watermarking, sw_to_stft,
)
from image_in_speech_watermarking_tpu.data.image_restoration import (  # noqa: F401
    DenoisePatchDataset, synthetic_image_pairs,
)
from image_in_speech_watermarking_tpu.data.imagenet import (  # noqa: F401
    ImageCoverDataset, load_imagenet_covers)
