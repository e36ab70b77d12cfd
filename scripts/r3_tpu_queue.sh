#!/usr/bin/env bash
# Round-3 TPU job queue, run AFTER the desync fine-tune completes.
# Serial: one chip, one CPU core.
set -x
cd "$(dirname "$0")/.."
CKPT=${1:-results/flagship_r3_desync/model}

# 1. headline sweep: fine-tuned flagship, resync ON, full battery
#    (incl. the new psychoacoustic codec points)
python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" \
    --size 5 --resync --save_artifacts 2 \
    --attacks "closed_loop,amplitude_scaling-0.8,echo_addition,low_pass,awgn-15,resampling,requantization,jittering-1000,jittering_2-1000,aac,aac-64k,mp3compress-128k,mp3compress-64k,time_scaling-0.9,time_scaling-1.1,pitch_scaling,time_shift-1000" \
    --result_dir results/eval_r3_desync 2>&1 | tail -40

# 2. ablation: same checkpoint, resync OFF (quantifies the sync stage)
python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" \
    --size 5 \
    --attacks "closed_loop,jittering-1000,time_scaling-0.9,time_scaling-1.1,pitch_scaling,aac,aac-64k,mp3compress-64k" \
    --result_dir results/eval_r3_desync_nosync 2>&1 | tail -20

# 3. (dropped) round-2-checkpoint + resync ablation: the round-2
#    checkpoint lived in gitignored results/ and was lost to a VM
#    restart mid-round; the flagship was retrained from scratch with
#    the robust bank instead (results/flagship_r3_desync).  The sync
#    stage's contribution is still isolated by ablation 2 above.

# 4. bench with the new train-step/MFU metrics (before the long HiDDeN
#    table so it is guaranteed to land inside the round)
python bench.py

# 5. Pallas packed-lane A/B on the real chip
python scripts/bench_pallas_ab.py 2>&1 | tail -10

# 6. HiDDeN table completion (longest job last; summary tolerates a
#    partially-finished table)
bash scripts/hidden_table_r3.sh 2>&1 | tail -30
python scripts/hidden_table_summary.py results/hidden_table_r3 || true
