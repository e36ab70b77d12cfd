"""torch<->JAX reference-parity harness (verification-only).

`refload` imports the PyTorch reference models from /root/reference;
`convert` ports their state_dicts into our flax trees so
tests/test_torch_parity.py can assert forward-output parity.
"""

from image_in_speech_watermarking_tpu.parity import convert, refload  # noqa: F401
