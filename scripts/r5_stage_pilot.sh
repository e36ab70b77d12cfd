#!/usr/bin/env bash
# Round-5 stage: fine-tune the pw2 flagship with (a) the in-band sync
# pilot stamped into every message (VERDICT r4 next-step #4 — alignment
# evidence becomes "does the pilot decode?", replacing the hand-measured
# blind-confidence gates) and (b) seam-pair channel training (VERDICT r4
# next-step #2 — the extractor sees the clip-seam overlap-add
# interference the round-4 decomposition localized at clips 3/5/8).
# Branch bank identical to pw2 (15 distinct branches, under the remote
# worker's compile ceiling).
set -u
cd "$(dirname "$0")/.."
NEPOCH=${1:-24}
INIT=${2:-results/flagship_r4_pw2/model}
bash scripts/train_resilient.sh results/flagship_r5_pilot 20 \
  python -m image_in_speech_watermarking_tpu.cli.train \
  --arch Uformer_audio --dataset synthetic --size 150 --batch_size 16 \
  --nepoch "$NEPOCH" --lr_initial 5e-5 --warmup_epochs 1 \
  --dtype bfloat16 --remat --featurize 255 --extractor_mag \
  --wm_pilot --robust_seam \
  --robust_attacks "closed_loop,awgn-15,amplitude_scaling-0.8,requantization,time_shift-16,time_warp-0.1,time_warp-0.02,jittering_2-1000,low_pass,resampling,aac-64k,mp3compress-64k,phase_walk_u-0.8*2,phase_walk_u-0.0*2,phase_walk-0.8" \
  --robust_mode channel --fig_every 0 \
  --init_from "$INIT" \
  --result_dir results/flagship_r5_pilot
