#!/usr/bin/env bash
# Round-3 HiDDeN table completion (VERDICT r2 item 3):
#  - resize/crop re-runs with the LS-GAN objective (late-training
#    collapse fix, committed round 2 but never demonstrated)
#  - the two missing reference regimes: cropout(0.55-0.6) and
#    combined-noise@400ep (hidden/README.md:97,101, runfiles/*.sh)
# Protocol identical to the round-2 table runs: binary marks, batch 12,
# 64 train + 12 val utterances, per-epoch validation.
set -e
cd "$(dirname "$0")/.."
RUNS=results/hidden_table_r3
COMMON="--batch-size 12 --size 64 --val-size 12 --wm_source binary --runs-folder $RUNS"

python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name resize_lsgan --epochs 300 --noise 'resize(0.7,0.8)' \
    --adv_loss lsgan $COMMON
python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name crop_lsgan --epochs 300 \
    --noise 'crop((0.2,0.25),(0.2,0.25))' --adv_loss lsgan $COMMON
python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name cropout --epochs 300 \
    --noise 'cropout((0.55,0.6),(0.55,0.6))' $COMMON
python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name combined --epochs 400 \
    --noise 'crop((0.4,0.55),(0.4,0.55))+cropout((0.25,0.35),(0.25,0.35))+dropout(0.25,0.35)+resize(0.4,0.6)+jpeg()' \
    $COMMON
python scripts/hidden_table_summary.py $RUNS
