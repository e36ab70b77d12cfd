#!/usr/bin/env bash
# Round-5 post-chain jobs (run after scripts/r5_resume_chain.sh frees
# the chip):
#   1. the train-split time_shift-1000 row the OOM kill ate (appends to
#      results/eval_r5_train/sample_result.txt in a fresh process, then
#      regenerates results.csv from the full 17-row file)
#   2. time_shift bimodality probe (docs/round5_demo README §1b)
#   3. bench.py — validates the corrected roofline + pipelined dispatch
set -x
cd "$(dirname "$0")/.."
CKPT=${1:-results/flagship_r4_pw2/model}

bash scripts/r5_hidden_bits.sh > /tmp/r5_hidden_bits.log 2>&1

timeout 3000 python scripts/r5_ts_probe.py "$CKPT" time_shift-1000 10 \
    > /tmp/r5_ts_probe.log 2>&1 || true

echo POSTCHAIN_DONE
