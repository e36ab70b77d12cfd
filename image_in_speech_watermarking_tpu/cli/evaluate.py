"""Evaluation CLI: attack x split sweep on a trained checkpoint.

Parity target: ``python evaluate.py`` -> model_test()
(uformerWM/evaluate.py:295-380): build datasets, load results/<run>/model
checkpoint, sweep attacks x {train,test}, write sample_result.txt +
results.csv.

Usage:
  python -m image_in_speech_watermarking_tpu.cli.evaluate \
      --checkpoint results/<run>/model --arch ModelA \
      --attacks closed_loop,awgn-15 --size 2
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    from image_in_speech_watermarking_tpu import data, models
    from image_in_speech_watermarking_tpu.eval import (DEFAULT_ATTACKS,
                                                       evaluate_model)
    from image_in_speech_watermarking_tpu.train import checkpoint

    p = argparse.ArgumentParser("evaluate")
    p.add_argument("--checkpoint", default=None,
                   help="orbax checkpoint dir (results/<run>/model); "
                        "fresh init if omitted (smoke mode)")
    p.add_argument("--arch", default="Uformer_audio")
    p.add_argument("--dataset", default="synthetic")
    p.add_argument("--attacks", default=",".join(DEFAULT_ATTACKS))
    p.add_argument("--size", type=int, default=5,
                   help="utterances per split (evaluate.py:327-331 uses 5)")
    p.add_argument("--result_dir", default="results/eval")
    p.add_argument("--wm_source", default="digits")
    p.add_argument("--use_host_codecs", action="store_true",
                   help="real ffmpeg aac/mp3 instead of the codec sim")
    p.add_argument("--save_artifacts", type=int, default=0, metavar="N",
                   help="dump the reference's wav/png/watermark artifact "
                        "set (evaluate.py:239-282) for the first N "
                        "utterances per attack x split")
    p.add_argument("--embed_dim", type=int, default=32)
    p.add_argument("--train_size", type=int, default=None,
                   help="utterances for the train-split min/max stats "
                        "(defaults to --size; set to the TRAINING corpus "
                        "size so min-max feature scaling matches the "
                        "checkpoint, evaluate.py:322-334)")
    p.add_argument("--audio_scale", default="0",
                   help="feature normalization used at train time "
                        "('0.025' or 'lo-hi'; min/max taken from the "
                        "train split like evaluate.py:322-334)")
    p.add_argument("--resync", action="store_true",
                   help="blind resynchronization search before extraction "
                        "(eval/sync.py): repairs the desync attacks "
                        "(jittering / time / pitch scaling)")
    p.add_argument("--stft_residual", action="store_true", default=True,
                   help="channel-sim stft_layer form; must match the "
                        "checkpoint's training run (see PARITY.md)")
    p.add_argument("--no-stft_residual", dest="stft_residual",
                   action="store_false")
    p.add_argument("--extractor_mag", action="store_true",
                   help="phase-invariant |STFT| extractor channel; must "
                        "match the checkpoint's training run (see "
                        "UformerConfig.extractor_mag)")
    p.add_argument("--wm_pilot", action="store_true",
                   help="checkpoint was trained with the in-band sync "
                        "pilot (data.watermark.stamp_pilot): stamp eval "
                        "messages the same way and drive the sync search "
                        "by pilot-region decode error instead of the "
                        "blind confidence cascade")
    p.add_argument("--splits", default="train,test",
                   help="comma list of splits to sweep (the reference "
                        "always does both, evaluate.py:327-331; a single "
                        "split halves sweep wall time)")
    args = p.parse_args(argv)

    # the sync-search constants are per-payload-channel: the |STFT|
    # extractor's confidence/stability landscape differs qualitatively
    # from the real/imag one (eval/sync.py SyncProfile notes)
    from image_in_speech_watermarking_tpu.eval import sync as _sync
    if args.wm_pilot:
        _sync.set_profile("pilot")
        _sync.set_pilot(data.pilot_pattern())
    else:
        _sync.set_profile("mag" if args.extractor_mag else "ri")
        _sync.set_pilot(None)

    model = models.get_arch(args.arch, embed_dim=args.embed_dim,
                            stft_residual=args.stft_residual,
                            extractor_mag=args.extractor_mag)
    model_name = "modelA" if args.arch == "ModelA" else "uformer"

    msgs = data.digit_watermarks(8, seed=0) \
        if args.wm_source == "digits" else data.binary_watermarks(8, seed=0)
    if args.wm_pilot:
        msgs = data.stamp_pilot(msgs)

    datasets = {}
    for split in tuple(s for s in args.splits.split(",") if s):
        waves = data.load_corpus(args.dataset, args.size, split=split)
        datasets[split] = data.SpeechDataset(waves, kind="eval")

    # train-split feature min/max for min-max audio_scale modes
    # (evaluate.py:322-334 builds SpeechDataTrain just for these)
    data_min, data_max = 0.0, 1.0
    if "-" in args.audio_scale:
        train_waves = data.load_corpus(args.dataset,
                                       args.train_size or args.size,
                                       split="train")
        ds_train = data.SpeechDataset(train_waves, kind="train",
                                      audio_scale=args.audio_scale)
        data_min = float(ds_train.data_min)
        data_max = float(ds_train.data_max)

    if args.checkpoint:
        checkpoint.check_model_cfg(args.checkpoint,
                                   getattr(model, 'cfg', None))
        restored = checkpoint.restore(args.checkpoint)
        variables = {"params": restored["params"]}
        if "batch_stats" in restored:
            variables["batch_stats"] = restored["batch_stats"]
    else:
        wave0, clips0, _ = next(iter(datasets.values())).utterance(0)
        variables = model.init(jax.random.key(0),
                               jnp.asarray(clips0[:1]),
                               jnp.asarray(msgs[:1]))

    results = evaluate_model(
        model, variables, datasets, msgs,
        attacks=tuple(a for a in args.attacks.split(",") if a),
        model_name=model_name, result_path=args.result_dir,
        use_host_codecs=args.use_host_codecs,
        audio_scale=args.audio_scale, data_min=data_min,
        data_max=data_max, save_artifacts=args.save_artifacts,
        resync=args.resync)
    for r in results:
        print("Result on {set} set, attack: {attack}: Total clips: "
              "{clips}, MSE loss {mse:.6f}, WM loss: {wm:.6f}, WM loss "
              "after attack: {wm_att:.6f}, SNR score: {snr:.3f}".format(**r))
    return results


if __name__ == "__main__":
    main()
