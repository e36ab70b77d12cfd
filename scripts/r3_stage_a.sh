#!/usr/bin/env bash
# Round-3 stage A: 50-epoch CLEAN pretrain to embed->decode lock
# (docs/round3_demo/README.md: the from-scratch channel-mode run never
# locks; the committed recipe is clean pretrain then robust fine-tune,
# mirroring the reference's fine_tune() protocol).
set -u
cd "$(dirname "$0")/.."
bash scripts/train_resilient.sh results/flagship_r3_clean 20 \
  python -m image_in_speech_watermarking_tpu.cli.train \
  --arch Uformer_audio --dataset synthetic --size 150 --batch_size 16 \
  --nepoch 50 --lr_initial 2e-4 --warmup_epochs 3 \
  --dtype bfloat16 --remat --featurize 255 --fig_every 15 \
  --result_dir results/flagship_r3_clean
