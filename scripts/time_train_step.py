"""Time the flagship train step on the real chip.

Timing rule (see memory: axon async-dispatch illusion): chain steps
through the donated TrainState data dependency and fetch a scalar at the
end — per-step block_until_ready under-measures through the tunnel.

Usage: python scripts/time_train_step.py --dtype bfloat16 --batch 24 \
           [--remat] [--robust closed_loop,awgn-15,...] [--steps 8]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from image_in_speech_watermarking_tpu import data, models
from image_in_speech_watermarking_tpu.config import TrainConfig
from image_in_speech_watermarking_tpu.train import Trainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--robust", default="")
    p.add_argument("--steps", type=int, default=8)
    args = p.parse_args()

    print(f"backend={jax.default_backend()} devices={jax.devices()}",
          flush=True)
    model = models.get_arch("Uformer_audio", compute_dtype=args.dtype,
                            **({"use_remat": True} if args.remat else {}))
    cfg = TrainConfig(batch_size=args.batch, nepoch=300, dtype=args.dtype,
                      remat=args.remat)
    robust = tuple(s for s in args.robust.split(",") if s)
    tr = Trainer(model, cfg, steps_per_epoch=100, robust_attacks=robust)

    rng = np.random.default_rng(0)
    batch = jnp.asarray(rng.standard_normal(
        (args.batch, 128, 128, 2)).astype(np.float32) * 0.1)
    msg = jnp.asarray(data.digit_watermarks(args.batch))

    t0 = time.time()
    state = tr.init_state(batch, msg)
    jax.block_until_ready(state.params)
    print(f"init: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    state, metrics = tr.train_step(state, batch, msg, jax.random.key(0))
    print(f"first step (compile): {time.time()-t0:.1f}s "
          f"loss={float(metrics['loss']):.4f}", flush=True)

    t0 = time.time()
    for i in range(args.steps):
        state, metrics = tr.train_step(state, batch, msg,
                                       jax.random.key(i + 1))
    loss = float(metrics["loss"])  # sync point, closes the chain
    dt = (time.time() - t0) / args.steps
    print(f"steady step: {dt*1000:.1f} ms  loss={loss:.4f}  "
          f"({args.batch} clips/step = {args.batch*1.024/dt:.1f}x realtime "
          f"train)", flush=True)


if __name__ == "__main__":
    main()
