#!/usr/bin/env bash
# Round-4 dress rehearsal (run before the full r4 queue): vocoder rows +
# desync rows on the fresh mag-channel flagship, 3 utterances, resync on.
# Confirms the magnitude payload channel cracked time/pitch scaling and
# measures per-row wall time to calibrate the N=20 sweep.
set -x
cd "$(dirname "$0")/.."
CKPT=${1:-results/flagship_r4_pw2/model}
time python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" --extractor_mag \
    --size 3 --splits test --resync \
    --attacks "closed_loop,awgn-15,time_scaling-0.9,time_scaling-1.1,pitch_scaling,jittering-1000,time_shift-1000,aac-64k" \
    --result_dir results/eval_r4_probe 2>&1 | tail -25
