#!/usr/bin/env bash
# Round-5 resume chain (post VM-restart): the headline N=20 test sweep
# is already committed (docs/round5_demo/eval_r5_test); this chain runs
# everything that was still queued, in VERDICT r4 priority order:
#   1. train-split sweep, N=5 (completes item 1's protocol)
#   2. resync-off ablation (item 1's "resync-off ablation alongside")
#   3. HiDDeN stabilized table (item 3 — "before the long fine-tunes")
#   4. pilot+seam fine-tune chain (items 2/4)
#   5. hardened-synthetic appendix sweep (item 8)
# Each stage logs to /tmp/r5_<stage>.log; progress greppable there.
set -x
cd "$(dirname "$0")/.."
CKPT=${1:-results/flagship_r4_pw2/model}
ATTACKS="closed_loop,amplitude_scaling-0.8,echo_addition,low_pass,awgn-15,resampling,requantization,jittering-1000,jittering_2-1000,aac,aac-64k,mp3compress-128k,mp3compress-64k,time_scaling-0.9,time_scaling-1.1,pitch_scaling,time_shift-1000"

python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" --extractor_mag \
    --size 5 --splits train --resync \
    --attacks "$ATTACKS" \
    --result_dir results/eval_r5_train > /tmp/r5_train_split.log 2>&1

python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" --extractor_mag \
    --size 20 --splits test \
    --attacks "closed_loop,jittering-1000,time_scaling-0.9,time_scaling-1.1,pitch_scaling,time_shift-1000" \
    --result_dir results/eval_r5_nosync > /tmp/r5_nosync.log 2>&1

bash scripts/hidden_table_r4.sh > /tmp/r5_hidden.log 2>&1
python scripts/hidden_table_summary.py results/hidden_table_r4 \
    >> /tmp/r5_hidden.log 2>&1 || true

bash scripts/r5_pilot_queue.sh 24 > /tmp/r5_pilot.log 2>&1

bash scripts/r5_hard_sweep.sh "$CKPT" > /tmp/r5_hard.log 2>&1

echo CHAIN_DONE
