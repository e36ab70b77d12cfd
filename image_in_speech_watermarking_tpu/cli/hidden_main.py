"""HiDDeN training CLI: ``new`` / ``continue`` runs.

Parity target: the absent hidden/main.py, reconstructed from
hidden/README.md:41-63 and hidden/runfiles/*.sh:
  main.py new --name <exp> --data-dir <d> --batch-size <b>
      --noise 'crop(...)+jpeg()' ...
  main.py continue --folder <runs/exp folder>
plus the epoch loop contract of hidden/utils.py (AverageMeter
accumulation, write_losses CSV, checkpoint dict every epoch).

Covers are time-domain 128x128 audio clips (hidden/audio_test.py:98-114),
messages are 32x32 watermark images (hidden/utils.py:125-137).

Usage:
  python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
      --name smoke --epochs 2 --size 4 --noise 'dropout(0.55,0.6)'
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _wm(args, batch: int, seed: int):
    from image_in_speech_watermarking_tpu import data

    if args.wm_source == "bits":
        return data.bit_messages(batch, args.message_bits, seed=seed)
    if args.wm_source == "binary":
        return data.binary_watermarks(batch, seed=seed)
    return data.digit_watermarks(batch, seed=seed)


def main(argv=None):
    from image_in_speech_watermarking_tpu import data
    from image_in_speech_watermarking_tpu.attacks import parse_noise_config
    from image_in_speech_watermarking_tpu.config import HiDDenConfig
    from image_in_speech_watermarking_tpu.train import checkpoint as ckpt
    from image_in_speech_watermarking_tpu.train.hidden_trainer import Hidden
    from image_in_speech_watermarking_tpu.utils import (
        create_folder_for_run, write_losses)

    p = argparse.ArgumentParser("hidden_main")
    p.add_argument("mode", choices=["new", "continue"])
    p.add_argument("--name", default="hidden")
    p.add_argument("--folder", default=None,
                   help="run folder for continue mode")
    p.add_argument("--runs-folder", default="runs")
    p.add_argument("--batch-size", type=int, default=12)
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--noise", default="")
    p.add_argument("--size", type=int, default=32,
                   help="utterances to load")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--message", type=int, default=32)
    p.add_argument("--wm_source", default="digits",
                   choices=["digits", "binary", "bits"],
                   help="watermark messages: MNIST-shaped digit glyphs, "
                        "random 32x32 binary images, or 'bits' = the "
                        "upstream-HiDDeN length-L bit-vector protocol "
                        "(hidden/test_model.py:50-64) that the README "
                        "bitwise-error table was measured under")
    p.add_argument("--message_bits", type=int, default=30,
                   help="message length L for --wm_source bits")
    p.add_argument("--val-size", type=int, default=8,
                   help="held-out utterances for the per-epoch validation "
                        "pass (the hidden README table reports validation "
                        "losses + bitwise error, hidden/README.md:94-101); "
                        "0 disables")
    p.add_argument("--adv_loss", default="bce", choices=["bce", "lsgan"],
                   help="adversarial objective: 'bce' (reference parity) "
                        "or 'lsgan' (saturation-free; stabilizes long "
                        "noise-regime runs)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA of enc/dec params; >0 validates and ships "
                        "the EMA weights (late-GAN-oscillation "
                        "stabilizer). validation.csv then reports the "
                        "EMA model; validation_raw.csv keeps the raw one")
    p.add_argument("--disc_lr", type=float, default=None,
                   help="separate (lower) discriminator lr (TTUR)")
    p.add_argument("--r1_gamma", type=float, default=0.0,
                   help="R1 gradient penalty weight on cover images")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args(argv)

    if args.wm_source == "bits":
        config = HiDDenConfig(message_length=args.message_bits,
                              message_mode="bits")
    else:
        config = HiDDenConfig(message_length=args.message)
    noiser = parse_noise_config(args.noise)
    net = Hidden(config, noiser=noiser, adv_loss=args.adv_loss,
                 ema_decay=args.ema_decay, disc_lr=args.disc_lr,
                 r1_gamma=args.r1_gamma)

    # data: time-domain clips as covers + digit watermarks as messages
    waves = data.load_corpus(args.dataset, args.size, seed=args.seed)
    ds = data.SpeechDataset(waves, kind="audio")
    covers = np.concatenate(ds.per_utterance, axis=0)
    val_covers = None
    if args.val_size:
        # offset=args.size: val utterances must start AFTER the train
        # pool for single-pool corpora (librispeech), not at val_size
        val_waves = data.load_corpus(args.dataset, args.val_size,
                                     split="val", seed=args.seed,
                                     offset=args.size)
        val_ds = data.SpeechDataset(val_waves, kind="audio")
        val_covers = np.concatenate(val_ds.per_utterance, axis=0)
    rng = np.random.default_rng(args.seed)

    start_epoch = 1
    if args.mode == "continue":
        assert args.folder, "--folder required for continue"
        run_dir = args.folder
        img0 = jnp.asarray(covers[: args.batch_size])
        msg0 = jnp.asarray(_wm(args, args.batch_size, 0))
        fresh = net.init_state(jax.random.key(args.seed), img0, msg0)
        payload = ckpt.restore_tree(
            os.path.join(run_dir, "checkpoints", "latest"),
            like=net.checkpoint_payload(fresh, 0))
        state = net.state_from_checkpoint(payload)
        start_epoch = int(payload["epoch"]) + 1
    else:
        run_dir = create_folder_for_run(args.runs_folder, args.name)
        with open(os.path.join(run_dir, "options.json"), "w") as f:
            json.dump(vars(args), f, indent=2)
        img0 = jnp.asarray(covers[: args.batch_size])
        msg0 = jnp.asarray(_wm(args, args.batch_size, 0))
        state = net.init_state(jax.random.key(args.seed), img0, msg0)

    assert len(covers) >= args.batch_size, (
        f"corpus has {len(covers)} clips < batch size {args.batch_size}")
    # device-resident epochs: covers pinned on device once, each epoch is
    # one scanned program + one stacked-losses fetch (hidden_trainer
    # run_epoch; the per-batch loop paid a tunnel round trip per batch)
    covers_dev = jax.device_put(jnp.asarray(covers))
    val_dev = (jax.device_put(jnp.asarray(val_covers))
               if val_covers is not None
               and len(val_covers) >= args.batch_size else None)

    key = jax.random.key(args.seed)
    # re-derive the best validation bitwise error on resume so the first
    # post-resume epoch can't clobber checkpoints/best with a worse model
    best_bitwise = None
    if args.mode == "continue":
        vcsv = os.path.join(run_dir, "validation.csv")
        if os.path.exists(vcsv):
            import csv as _csv
            with open(vcsv) as f:
                vals = [float(r["bitwise-error"])
                        for r in _csv.DictReader(f) if "bitwise-error" in r]
            best_bitwise = min(vals) if vals else None
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        nb = len(covers) // args.batch_size
        order = rng.permutation(len(covers))[: nb * args.batch_size]
        idx = order.reshape(nb, args.batch_size).astype(np.int32)
        msgs = np.stack([_wm(args, args.batch_size, epoch * 1000 + b)
                         for b in range(nb)])
        key, sub = jax.random.split(key)
        state, stacked = net.run_epoch(state, covers_dev, idx, msgs, sub)
        stacked = jax.device_get(stacked)
        avg = {k: float(np.mean(v)) for k, v in stacked.items()}
        write_losses(os.path.join(run_dir, "train.csv"), avg, epoch,
                     time.time() - t0)
        print(f"epoch {epoch}: " + " ".join(
            f"{k}={v:.4f}" for k, v in avg.items()))
        if val_dev is not None:
            tv = time.time()
            nvb = len(val_covers) // args.batch_size
            vidx = np.arange(nvb * args.batch_size, dtype=np.int32)
            vidx = vidx.reshape(nvb, args.batch_size)
            vmsgs = np.stack([
                _wm(args, args.batch_size, 500_000 + epoch * 1000 + b)
                for b in range(nvb)])
            key, sub = jax.random.split(key)
            # with EMA on, validation.csv reports the EMA (shipped)
            # model; the raw weights go to validation_raw.csv
            vst = jax.device_get(net.run_val_epoch(
                net.ema_state(state), val_dev, vidx, vmsgs, sub))
            vavg = {k: float(np.mean(v)) for k, v in vst.items()}
            if state.ema is not None:
                vraw = jax.device_get(net.run_val_epoch(
                    state, val_dev, vidx, vmsgs, sub))
                write_losses(
                    os.path.join(run_dir, "validation_raw.csv"),
                    {k: float(np.mean(v)) for k, v in vraw.items()},
                    epoch, 0.0)
            write_losses(os.path.join(run_dir, "validation.csv"), vavg,
                         epoch, time.time() - tv)
            print(f"  val {epoch}: " + " ".join(
                f"{k}={v:.4f}" for k, v in vavg.items()))
            # keep the shippable model: adversarial training oscillates
            # late (the README-table runs are selected checkpoints, not
            # blindly the final epoch)
            if best_bitwise is None or vavg["bitwise-error"] < best_bitwise:
                best_bitwise = vavg["bitwise-error"]
                ckpt.save_tree(os.path.join(run_dir, "checkpoints", "best"),
                               net.checkpoint_payload(state, epoch))
        ckpt.save_tree(os.path.join(run_dir, "checkpoints", "latest"),
                       net.checkpoint_payload(state, epoch))
    print(f"run folder: {run_dir}")
    return run_dir


if __name__ == "__main__":
    main()
