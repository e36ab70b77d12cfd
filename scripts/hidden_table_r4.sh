#!/usr/bin/env bash
# Round-4 HiDDeN table stabilization (VERDICT r3 item 3): the two
# regimes whose FINAL-epoch bitwise error still collapsed in round 3 —
# crop (final 0.2346 vs reference 0.0603) and cropout (0.3570 vs
# 0.0647) — rerun with the adversarial stabilizers: LS-GAN objective +
# EMA(0.999) of the enc/dec params (the validated/shipped weights) +
# TTUR discriminator lr (2.5e-4 vs 1e-3) + R1 penalty (gamma 1.0).
# Protocol otherwise identical to the round-2/3 table runs (reference
# hidden/README.md:96-97: 300 epochs, final-epoch numbers): binary
# marks, batch 12, 64 train + 12 val utterances, per-epoch validation.
set -e
cd "$(dirname "$0")/.."
RUNS=results/hidden_table_r4
COMMON="--batch-size 12 --size 64 --val-size 12 --wm_source binary \
 --runs-folder $RUNS --adv_loss lsgan --ema_decay 0.999 \
 --disc_lr 2.5e-4 --r1_gamma 1.0"

python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name crop_stab --epochs 300 \
    --noise 'crop((0.2,0.25),(0.2,0.25))' $COMMON
python scripts/hidden_table_summary.py $RUNS || true
python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
    --name cropout_stab --epochs 300 \
    --noise 'cropout((0.55,0.6),(0.55,0.6))' $COMMON
python scripts/hidden_table_summary.py $RUNS || true
