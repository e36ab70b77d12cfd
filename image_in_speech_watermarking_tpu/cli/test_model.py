"""HiDDeN single-batch check CLI.

Parity target: hidden/test_model.py:24-72 — load a checkpoint, take a
random cover + random bit message, one validate pass, print the losses and
the decoder bitwise error.

Usage:
  python -m image_in_speech_watermarking_tpu.cli.test_model \
      [--checkpoint runs/<run>/model] [--noise 'jpeg()+quant()']
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from image_in_speech_watermarking_tpu import data
    from image_in_speech_watermarking_tpu.attacks import parse_noise_config
    from image_in_speech_watermarking_tpu.eval import metrics
    from image_in_speech_watermarking_tpu.models import HiddenEncoderDecoder
    from image_in_speech_watermarking_tpu.train import checkpoint

    p = argparse.ArgumentParser("test_model")
    p.add_argument("--checkpoint", "-c", default=None)
    p.add_argument("--noise", default="")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    model = HiddenEncoderDecoder()
    rng = jax.random.key(args.seed)
    k1, k2, k3 = jax.random.split(rng, 3)

    # random 128x128 cover in [-1, 1] (test_model.py:50-55 randomCrop +
    # [-1,1] normalization) and a random binary 32x32 message
    cover = jax.random.uniform(k1, (1, 128, 128, 1), minval=-1.0,
                               maxval=1.0)
    message = jax.random.bernoulli(k2, 0.5, (1, 32, 32, 1)).astype(
        jnp.float32)

    if args.checkpoint:
        restored = checkpoint.restore(args.checkpoint)
        variables = {"params": restored["params"]}
        if "batch_stats" in restored:
            variables["batch_stats"] = restored["batch_stats"]
    else:
        variables = model.init(jax.random.key(0), cover, message)

    noiser = parse_noise_config(args.noise) if args.noise else None
    encoded, noised, decoded = model.apply(
        variables, cover, message, noiser=noiser, noiser_key=k3)

    enc_mse = metrics.mse(encoded, cover)
    dec_mse = metrics.mse(decoded, message)
    err = metrics.bitwise_error(np.asarray(decoded), np.asarray(message))
    print(f"encoder_mse: {enc_mse:.6f}")
    print(f"decoder_mse: {dec_mse:.6f}")
    print(f"error : {err:.3f}")  # test_model.py:66 print format
    return err


if __name__ == "__main__":
    main()
