#!/usr/bin/env bash
# Round-5 HiDDeN bit-protocol table (VERDICT item 3, root-caused):
# the reference's crop/cropout bitwise errors (hidden/README.md:96-97,
# 0.0603 / 0.0647) were measured under the UPSTREAM HiDDeN protocol —
# length-30 bit messages broadcast as constant planes + a global-pooled
# decoder (runfiles/*.sh train on /data/coco/10K; test_model.py:53-56
# draws random bit vectors). The snapshot's image-message decoder (the
# one our r3/r4 table used) carries a 1024-bit spatial payload whose
# local receptive fields CANNOT survive a ~5%-area crop — the r4
# stabilized rerun plateaued at ~0.3-0.45 bitwise error by
# construction, not by training failure.
# This queue reruns the two regimes under the faithful bit protocol
# (--wm_source bits, message_mode='bits' masked-global-pool decoder).
# 150 epochs (vs the reference's 300) to fit the round's chip budget —
# the comparison column notes the epoch count.
set -x
cd "$(dirname "$0")/.."
RUNS=results/hidden_table_r5_bits
COMMON="--batch-size 12 --size 64 --val-size 12 --wm_source bits \
 --message_bits 30 --runs-folder $RUNS --adv_loss lsgan \
 --ema_decay 0.999 --disc_lr 2.5e-4 --r1_gamma 1.0"

python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name crop_bits --epochs 150 \
    --noise 'crop((0.2,0.25),(0.2,0.25))' $COMMON
python scripts/hidden_table_summary.py $RUNS || true
python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name cropout_bits --epochs 150 \
    --noise 'cropout((0.55,0.6),(0.55,0.6))' $COMMON
python scripts/hidden_table_summary.py $RUNS || true
