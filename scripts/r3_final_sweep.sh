#!/usr/bin/env bash
# Round-3 closing queue (reduced to fit the remaining round clock):
# headline sweep at size 3 (vs the reference's 5 utterances/split;
# evaluate.py:327-331) with the staged lattice resync, then the
# resync-off ablation (cheap: no searches when --resync is absent).
# Evidence is committed after each landing.
set -u
cd "$(dirname "$0")/.."
CKPT=${1:-results/flagship_r3_desync/model}

commit_paths() {
    local msg=$1; shift
    for i in 1 2 3; do
        git add "$@" 2>/dev/null
        if git commit -m "$msg" -- "$@" >/dev/null 2>&1; then
            echo "[queue] committed: $msg"; return 0
        fi
        sleep 10
    done
    echo "[queue] WARNING: could not commit: $msg" >&2
}

snapshot_sweep() {
    local run=$1 msg=$2
    if [ ! -f "results/$run/results.csv" ] && [ -f "results/$run/sample_result.txt" ]; then
        python - "results/$run" <<'PY'
import sys
from image_in_speech_watermarking_tpu.eval import process_data_to_csv
d = sys.argv[1]
process_data_to_csv(open(f"{d}/sample_result.txt").read(), f"{d}/results.csv")
PY
    fi
    [ -f "results/$run/results.csv" ] || return 0
    mkdir -p "docs/round3_demo/$run"
    cp "results/$run/results.csv" "results/$run/sample_result.txt" \
        "docs/round3_demo/$run/" 2>/dev/null
    python scripts/sweep_to_md.py "results/$run/results.csv" \
        > "docs/round3_demo/$run/table.md" 2>/dev/null || true
    commit_paths "$msg" "docs/round3_demo/$run"
}

rm -rf results/eval_r3_final results/eval_r3_final_nosync
python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" \
    --size 3 --resync --save_artifacts 1 \
    --attacks "closed_loop,amplitude_scaling-0.8,echo_addition,low_pass,awgn-15,resampling,requantization,jittering-1000,jittering_2-1000,aac,aac-64k,mp3compress-128k,mp3compress-64k,time_scaling-0.9,time_scaling-1.1,pitch_scaling,time_shift-1000" \
    --result_dir results/eval_r3_final 2>&1 | tail -40
snapshot_sweep eval_r3_final "Round-3 headline sweep: full battery, lattice resync on"

python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint "$CKPT" \
    --size 3 --splits test \
    --attacks "closed_loop,jittering-1000,time_scaling-0.9,pitch_scaling,aac-64k,mp3compress-64k,time_shift-1000" \
    --result_dir results/eval_r3_final_nosync 2>&1 | tail -20
snapshot_sweep eval_r3_final_nosync "Round-3 resync ablation: same checkpoint, resync off"
echo "[queue] done at $(date)"
