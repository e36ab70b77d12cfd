#!/usr/bin/env bash
# Round-3 stage B (combined): channel-mode robust fine-tune with the
# FULL final bank in one stage — the stage-B 12-branch desync/codec
# bank PLUS the stage-D vocoder_roundtrip branches. The original round
# ran B -> C (phase_noise) -> D (vocoder_roundtrip) sequentially; the
# stage-C phase_noise proxy was measured NOT to transfer to the real
# vocoder rows (docs/round3_demo/README.md), so after the VM restart
# wiped the checkpoints the relaunch collapses to A -> B' with the
# stage-D bank directly. Every branch was verified learnable
# (per-branch wm_decode converging) in the lost run.
set -u
cd "$(dirname "$0")/.."
NEPOCH=${1:-30}
bash scripts/train_resilient.sh results/flagship_r3_desync 20 \
  python -m image_in_speech_watermarking_tpu.cli.train \
  --arch Uformer_audio --dataset synthetic --size 150 --batch_size 16 \
  --nepoch "$NEPOCH" --lr_initial 5e-5 --warmup_epochs 1 \
  --dtype bfloat16 --remat --featurize 255 \
  --robust_attacks closed_loop,awgn-15,amplitude_scaling-0.8,requantization,time_shift-16,time_warp-0.1,time_warp-0.02,jittering_2-1000,low_pass,resampling,aac-64k,mp3compress-64k,vocoder_roundtrip-0.9,vocoder_roundtrip-1.1 \
  --robust_mode channel --fig_every 15 --save_every 2 \
  --init_from results/flagship_r3_clean/model \
  --result_dir results/flagship_r3_desync
