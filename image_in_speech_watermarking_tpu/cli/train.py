"""Training CLI.

Parity target: ``python audio_uformer_stft.py --arch Uformer_audio
--dataset tedlium`` (uformerWM/audio_uformer_stft.py:17-585 + the option
surface of uformerWM/options.py:4-68). Adds TPU-native flags: --mesh,
--dtype, --remat.

Usage:
  python -m image_in_speech_watermarking_tpu.cli.train \
      --arch Uformer_audio --dataset synthetic --size 8 --nepoch 3
"""

from __future__ import annotations

import argparse
import datetime
import os

import jax
import jax.numpy as jnp


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("train")
    # reference option surface (options.py:9-68)
    p.add_argument("--arch", default="Uformer_audio")
    p.add_argument("--dataset", default="synthetic",
                   choices=["tedlium", "librispeech", "synthetic"])
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--nepoch", type=int, default=300)
    p.add_argument("--lr_initial", type=float, default=2e-4)
    p.add_argument("--weight_decay", type=float, default=0.02)
    p.add_argument("--warmup", action="store_true", default=True)
    p.add_argument("--no-warmup", dest="warmup", action="store_false")
    p.add_argument("--warmup_epochs", type=int, default=3)
    p.add_argument("--train_ps", type=int, default=128)
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--win_size", type=int, default=8)
    p.add_argument("--token_projection", default="linear")
    p.add_argument("--token_mlp", default="leff")
    p.add_argument("--dd_in", type=int, default=2)
    p.add_argument("--image_scale", type=float, default=1.0)
    p.add_argument("--audio_scale", default="0")
    p.add_argument("--wm_source", default="digits",
                   choices=["digits", "binary", "mnist"])
    p.add_argument("--size", type=int, default=300,
                   help="utterances to load")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--result_dir", default=None)
    # TPU-native extras
    p.add_argument("--mesh", default="-1",
                   help="mesh shape, e.g. '8' (dp) or '4,2' (dp,fsdp)")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--stft_residual", action="store_true", default=True,
                   help="channel-sim stft_layer as a zero-init residual "
                        "refinement (our default; see PARITY.md)")
    p.add_argument("--no-stft_residual", dest="stft_residual",
                   action="store_false",
                   help="reference-parity plain conv stack "
                        "(model.py:2465)")
    p.add_argument("--extractor_mag", action="store_true",
                   help="phase-invariant payload channel: the extractor "
                        "reads |STFT| as a third input channel (see "
                        "UformerConfig.extractor_mag; beyond reference "
                        "parity — defends the whole-wave vocoder "
                        "attacks). --init_from checkpoints without it "
                        "are poured via zero-pad surgery")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for matmuls/convs (MXU); norms, "
                        "softmax and the DFT stay f32")
    p.add_argument("--featurize", default="256", choices=["256", "255"],
                   help="training featurization geometry: '256' is the "
                        "reference's SpeechDataTrain (n_fft 256 hop 128, "
                        "drop 129th bin; the in-graph n_fft-255 channel "
                        "sim is then inconsistent with the clip geometry "
                        "— the reference quirk); '255' trains on the "
                        "eval-chain geometry so the round trip is exact")
    p.add_argument("--robust_attacks", default="",
                   help="comma list of in-graph training attacks, e.g. "
                        "'closed_loop,awgn-15,amplitude_scaling-0.8'")
    p.add_argument("--resume", default=None, metavar="CKPT",
                   help="resume exactly from a checkpoint dir (params + "
                        "optimizer + epoch; train_denoise.py:103-122)")
    p.add_argument("--init_from", default=None, metavar="CKPT",
                   help="fine-tune: load params only, fresh optimizer "
                        "(audio_uformer_stft.py fine_tune())")
    p.add_argument("--freeze", default="",
                   help="comma list of param-path substrings to freeze "
                        "(utils/model_utils.py:10-25)")
    p.add_argument("--early_stop", type=int, default=None,
                   help="early-stop patience in epochs "
                        "(train_modelA.py:511-514)")
    p.add_argument("--fig_every", type=int, default=0, metavar="N",
                   help="save message/pred/decode figure grids every N "
                        "epochs (audio_uformer_stft.py:486-536)")
    p.add_argument("--save_every", type=int, default=1, metavar="N",
                   help="min epochs between best-loss checkpoint writes")
    p.add_argument("--robust_mode", default="channel",
                   choices=["channel", "aux"],
                   help="how --robust_attacks enter the graph: 'channel' "
                        "= extractor reads the attacked clip (HiDDeN "
                        "noiser topology, baseline-size program); 'aux' "
                        "= extra attacked-decode loss term (doubles the "
                        "extractor in the program)")
    p.add_argument("--wm_pilot", action="store_true",
                   help="stamp the in-band sync pilot "
                        "(data.watermark.stamp_pilot) into every training "
                        "message; at eval --wm_pilot drives the sync "
                        "search by pilot decode error")
    p.add_argument("--robust_seam", action="store_true",
                   help="channel mode: attack consecutive clip PAIRS as "
                        "one continuous wave (overlap-add seam between "
                        "them), so the extractor trains on the clip-seam "
                        "interference it sees at eval (round-4 "
                        "decomposition residual, round4_demo §2f)")
    p.add_argument("--no_epoch_scan", action="store_true",
                   help="disable the device-resident epoch lax.scan and "
                        "run the per-step host loop (smaller XLA program; "
                        "contingency for remote-worker compile crashes)")
    return p


def main(argv=None) -> str:
    from image_in_speech_watermarking_tpu import data, models
    from image_in_speech_watermarking_tpu.config import TrainConfig
    from image_in_speech_watermarking_tpu.parallel import make_mesh
    from image_in_speech_watermarking_tpu.train import Trainer

    args = build_parser().parse_args(argv)
    shape = tuple(int(s) for s in args.mesh.split(","))
    axes = ("data", "model")[: len(shape)]
    cfg = TrainConfig(
        arch=args.arch, dataset=args.dataset, batch_size=args.batch_size,
        nepoch=args.nepoch, lr_initial=args.lr_initial,
        weight_decay=args.weight_decay, warmup=args.warmup,
        warmup_epochs=args.warmup_epochs, train_ps=args.train_ps,
        image_scale=args.image_scale, audio_scale=args.audio_scale,
        seed=args.seed, mesh_shape=shape, mesh_axes=axes,
        remat=args.remat, dtype=args.dtype,
        epoch_scan=not args.no_epoch_scan)

    model = models.get_arch(
        args.arch, train_ps=args.train_ps, embed_dim=args.embed_dim,
        win_size=args.win_size, token_projection=args.token_projection,
        token_mlp=args.token_mlp, dd_in=args.dd_in,
        compute_dtype=args.dtype, stft_residual=args.stft_residual,
        extractor_mag=args.extractor_mag,
        **({"use_remat": True} if args.remat
           and args.arch == "Uformer_audio" else {}))

    if args.dataset == "imagenet":
        # image-cover mode (audio_uformer_stft.py:150-204): 128x128
        # ImageNet-normalized RGB crops as covers; pick an arch with
        # 3-channel input (e.g. --dd_in 3)
        from image_in_speech_watermarking_tpu.data.imagenet import (
            ImageCoverDataset)

        ds = ImageCoverDataset(size=args.size, seed=args.seed)
    else:
        waves = data.load_corpus(args.dataset, args.size, split="train",
                                 seed=args.seed)
        ds = data.SpeechDataset(
            waves, kind="train" if args.featurize == "256" else "train255",
            audio_scale=args.audio_scale)
    steps = max(len(ds) // args.batch_size, 1)
    # epoch-keyed stream: makes --resume reproduce the uninterrupted run
    wm = lambda epoch: data.watermark_stream(  # noqa: E731
        args.batch_size, source=args.wm_source,
        seed=args.seed + 7919 * epoch, image_scale=args.image_scale,
        pilot=args.wm_pilot)

    # run-dir naming parity: results/<arch>-<dataset>-<timestamp>
    # (audio_uformer_stft.py:373-379)
    result_dir = args.result_dir or os.path.join(
        "results", "{}-{}-{}".format(
            args.arch, args.dataset,
            datetime.datetime.now().strftime("%d%m%Y_%H%M%S")))

    mesh = make_mesh(shape, axes)
    robust = tuple(s for s in args.robust_attacks.split(",") if s)
    freeze = tuple(s for s in args.freeze.split(",") if s)
    trainer = Trainer(model, cfg, steps_per_epoch=steps, mesh=mesh,
                      robust_attacks=robust, robust_mode=args.robust_mode,
                      robust_seam=args.robust_seam, freeze=freeze)
    trainer.fit(ds, wm, result_dir=result_dir, resume_from=args.resume,
                init_from=args.init_from,
                early_stop_patience=args.early_stop,
                fig_every=args.fig_every, save_every=args.save_every)
    print(f"done; artifacts in {result_dir}")
    return result_dir


if __name__ == "__main__":
    main()
