#!/usr/bin/env bash
# Round-5 hardened-synthetic appendix (VERDICT r4 next-step #8): the
# headline battery on the synthetic_hard eval split (long silences,
# wideband fricatives, plosive onsets, clipping-level dynamics) to show
# the headline numbers are not an artifact of the smooth default corpus.
#
# bench.py runs FIRST (20 min; validates the corrected HBM roofline +
# pipelined-dispatch headline before any long sweep can starve it).
# The sweep runs one attack per process: rows append to the shared
# sample_result.txt and each invocation regenerates results.csv, so a
# cut-off run still leaves a valid partial table (and no process lives
# long enough for cache growth to matter).
set -x
cd "$(dirname "$0")/.."
CKPT=${1:-results/flagship_r4_pw2/model}
ATTACKS="closed_loop awgn-15 low_pass requantization aac-64k mp3compress-64k jittering-1000 time_scaling-0.9 time_scaling-1.1 pitch_scaling time_shift-1000"

timeout 3000 python bench.py > /tmp/r5_bench.log 2>&1 || true

for a in $ATTACKS; do
    python -m image_in_speech_watermarking_tpu.cli.evaluate \
        --checkpoint "$CKPT" --extractor_mag \
        --dataset synthetic_hard \
        --size 5 --splits test --resync \
        --attacks "$a" \
        --result_dir results/eval_r5_hard 2>&1 | tail -3
done
