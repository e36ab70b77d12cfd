from image_in_speech_watermarking_tpu.dsp.stft import (  # noqa: F401
    stft, istft, stft_ri, istft_ri, frame_signal, num_frames,
    spec_to_clips, clips_to_spec,
)
