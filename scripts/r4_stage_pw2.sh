#!/usr/bin/env bash
# Round-4b stage pw2: fine-tune the phase-walk flagship with the
# STATIONARY-STATE walk branches (docs/round4_demo/README.md §2e).
# The r4 decomposition showed whole-wave vocoder damage on late clips is
# the walk's stationary regime — per-bin initial phase iid U(-pi,pi) —
# which the zero-init phase_walk branches never visit. phase_walk_u-0.0
# is the pure static uniform all-pass that reproduces the late-clip
# damage flat across clips (scripts/r4_decomp2.py: 0.0532 on every
# clip); phase_walk_u-0.8 adds the frame-to-frame decoherence.
# phase_walk-0.8 (zero-init) is retained so the clip-0 regime is not
# forgotten. 15 distinct branches = the r4_mag program size, under the
# remote worker's compile ceiling (ROADMAP #9).
set -u
cd "$(dirname "$0")/.."
NEPOCH=${1:-24}
INIT=${2:-results/flagship_r4_pw/model}
bash scripts/train_resilient.sh results/flagship_r4_pw2 20 \
  python -m image_in_speech_watermarking_tpu.cli.train \
  --arch Uformer_audio --dataset synthetic --size 150 --batch_size 16 \
  --nepoch "$NEPOCH" --lr_initial 5e-5 --warmup_epochs 1 \
  --dtype bfloat16 --remat --featurize 255 --extractor_mag \
  --robust_attacks "closed_loop,awgn-15,amplitude_scaling-0.8,requantization,time_shift-16,time_warp-0.1,time_warp-0.02,jittering_2-1000,low_pass,resampling,aac-64k,mp3compress-64k,phase_walk_u-0.8*2,phase_walk_u-0.0*2,phase_walk-0.8" \
  --robust_mode channel --fig_every 0 \
  --init_from "$INIT" \
  --result_dir results/flagship_r4_pw2
