from image_in_speech_watermarking_tpu.utils.meters import (  # noqa: F401
    AverageMeter,
)
from image_in_speech_watermarking_tpu.utils.runs import (  # noqa: F401
    create_folder_for_run, write_losses,
)
from image_in_speech_watermarking_tpu.utils.flops import (  # noqa: F401
    param_count, param_table, profile_fn, roofline_ms,
)
