#!/usr/bin/env bash
# Round-3 stage C: short fine-tune adding the phase_noise branch (the
# phase-vocoder residual surrogate) on top of the stage-B desync model.
# See docs/round3_demo/README.md for the three-stage rationale.
set -u
cd "$(dirname "$0")/.."
bash scripts/train_resilient.sh results/flagship_r3_final 20 \
  python -m image_in_speech_watermarking_tpu.cli.train \
  --arch Uformer_audio --dataset synthetic --size 150 --batch_size 16 \
  --nepoch 30 --lr_initial 5e-5 --warmup_epochs 1 \
  --dtype bfloat16 --remat --featurize 255 \
  --robust_attacks closed_loop,awgn-15,amplitude_scaling-0.8,requantization,time_shift-16,time_warp-0.1,time_warp-0.02,jittering_2-1000,low_pass,resampling,aac-64k,mp3compress-64k,phase_noise-1.0 \
  --robust_mode channel --fig_every 15 \
  --init_from results/flagship_r3_desync/model \
  --result_dir results/flagship_r3_final
