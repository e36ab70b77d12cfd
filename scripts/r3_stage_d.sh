#!/usr/bin/env bash
# Round-3 stage D (contingency): fine-tune with the REAL post-resync
# vocoder residual in the bank — vocoder_roundtrip-0.9/1.1 (stretch +
# inverse stretch, attacks/waveform.py) replacing the phase_noise proxy,
# which the stage-C sweep showed transfers only partially to the
# time/pitch-scaling eval rows. Starts from the stage-C checkpoint.
set -u
cd "$(dirname "$0")/.."
NEPOCH=${1:-14}
bash scripts/train_resilient.sh results/flagship_r3_vocoder 20 \
  python -m image_in_speech_watermarking_tpu.cli.train \
  --arch Uformer_audio --dataset synthetic --size 150 --batch_size 16 \
  --nepoch "$NEPOCH" --lr_initial 5e-5 --warmup_epochs 1 \
  --dtype bfloat16 --remat --featurize 255 \
  --robust_attacks closed_loop,awgn-15,amplitude_scaling-0.8,requantization,time_shift-16,time_warp-0.1,time_warp-0.02,jittering_2-1000,low_pass,resampling,aac-64k,mp3compress-64k,vocoder_roundtrip-0.9,vocoder_roundtrip-1.1 \
  --robust_mode channel --fig_every 15 \
  --init_from results/flagship_r3_final/model \
  --result_dir results/flagship_r3_vocoder
