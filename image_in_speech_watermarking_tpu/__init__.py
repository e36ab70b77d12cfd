"""image-in-speech-watermarking, TPU-native.

A from-scratch JAX/XLA/Pallas framework for hiding small images (watermarks,
e.g. 32x32 MNIST digits) inside 16 kHz speech, robust to a battery of signal
level attacks. Functional parity target: the reference PyTorch research
codebase ``speech-watermarking/image-in-speech-watermarking`` (two
subprojects: ``uformerWM`` — Uformer window-attention U-Net embedder/extractor
on STFT spectrograms — and ``hidden`` — HiDDeN-style conv encoder/decoder on
time-domain clips).

Everything on the compute path is pure JAX: STFT/ISTFT front-end, models,
the differentiable attack battery, training and evaluation loops. Hot ops
have Pallas TPU kernels. Multi-chip scaling uses ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"

from image_in_speech_watermarking_tpu import config as config  # noqa: F401


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax-heavy modules at
    # package import)
    if name == "Watermarker":
        from image_in_speech_watermarking_tpu.serve import Watermarker
        return Watermarker
    raise AttributeError(name)
