"""Image-restoration training CLI (the inherited Uformer denoise path).

Parity target: uformerWM/train/train_denoise.py — stock Uformer arch,
Charbonnier loss (:127), AdamW + warmup-cosine, patch dataset with 8-way
augmentation (+ MixUp after epoch 5, :181-182), periodic PSNR eval with
best-model checkpointing (:191-218). The reference's DataParallel becomes
mesh batch sharding.

Usage (smoke):
  python -m image_in_speech_watermarking_tpu.cli.train_denoise \
      --nepoch 2 --train_ps 64 --embed_dim 8 --size 8
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(argv=None):
    import dataclasses

    from image_in_speech_watermarking_tpu import models
    from image_in_speech_watermarking_tpu.config import stock_uformer
    from image_in_speech_watermarking_tpu.data.image_restoration import (
        DenoisePatchDataset, synthetic_image_pairs)
    from image_in_speech_watermarking_tpu.eval.image_metrics import (
        batch_psnr)
    from image_in_speech_watermarking_tpu.train import checkpoint as ckpt
    from image_in_speech_watermarking_tpu.train.losses import (
        charbonnier_loss)
    from image_in_speech_watermarking_tpu.train.schedulers import (
        warmup_cosine)

    p = argparse.ArgumentParser("train_denoise")
    p.add_argument("--arch", default="Uformer")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--nepoch", type=int, default=250)
    p.add_argument("--lr_initial", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.02)
    p.add_argument("--warmup_epochs", type=int, default=3)
    p.add_argument("--mixup_after", type=int, default=5)  # :181-182
    p.add_argument("--train_ps", type=int, default=128)
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--sigma", type=float, default=25.0)
    p.add_argument("--seed", type=int, default=1234)  # train_denoise.py:63
    p.add_argument("--result_dir", default="results/denoise")
    args = p.parse_args(argv)

    cfg = dataclasses.replace(
        stock_uformer(img_size=args.train_ps, embed_dim=args.embed_dim))
    model = models.Uformer(cfg)

    clean, noisy = synthetic_image_pairs(args.size, args.train_ps,
                                         seed=args.seed, sigma=args.sigma)
    val_clean, val_noisy = synthetic_image_pairs(
        max(args.size // 4, 2), args.train_ps, seed=args.seed + 1,
        sigma=args.sigma)

    steps = max(len(clean) // args.batch_size, 1)
    sched = warmup_cosine(args.lr_initial, args.warmup_epochs, args.nepoch,
                          steps, lr_min=1e-6)
    tx = optax.adamw(sched, weight_decay=args.weight_decay)

    x0 = jnp.asarray(noisy[: args.batch_size])
    params = jax.jit(model.init)(jax.random.key(args.seed), x0)
    opt_state = tx.init(params["params"])

    @jax.jit
    def step(params, opt_state, noisy_b, clean_b):
        def loss_fn(p):
            restored = model.apply({"params": p}, noisy_b)
            return charbonnier_loss(restored, clean_b)
        loss, grads = jax.value_and_grad(loss_fn)(params["params"])
        updates, opt_state = tx.update(grads, opt_state, params["params"])
        return ({"params": optax.apply_updates(params["params"], updates)},
                opt_state, loss)

    @jax.jit
    def infer(params, noisy_b):
        return model.apply(params, noisy_b)

    os.makedirs(args.result_dir, exist_ok=True)
    best_psnr = -1.0
    for epoch in range(1, args.nepoch + 1):
        ds = DenoisePatchDataset(clean, noisy, args.train_ps,
                                 use_mixup=epoch > args.mixup_after,
                                 seed=args.seed + epoch)
        epoch_loss = 0.0
        for cb, nb in ds.batches(args.batch_size):
            params, opt_state, loss = step(params, opt_state,
                                           jnp.asarray(nb),
                                           jnp.asarray(cb))
            epoch_loss += float(loss)
        restored = np.asarray(infer(params, jnp.asarray(val_noisy)))
        psnr = batch_psnr(np.clip(restored, 0, 1), val_clean)
        print(f"epoch {epoch}: loss {epoch_loss:.4f} val PSNR {psnr:.2f}")
        if psnr > best_psnr:
            best_psnr = psnr

            class _S:  # minimal TrainState-shaped holder
                pass

            s = _S()
            s.params, s.opt_state = params["params"], opt_state
            s.step, s.batch_stats = epoch, None
            ckpt.save(os.path.join(args.result_dir, "model_best"), s,
                      epoch=epoch)
    print(f"best PSNR: {best_psnr:.2f}")
    return best_psnr


if __name__ == "__main__":
    main()
