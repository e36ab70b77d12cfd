from image_in_speech_watermarking_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding, fsdp_param_specs, make_mesh, replicated, shard_params,
)
