#!/usr/bin/env bash
# Round-3 relaunch chain (after the second VM restart wiped results/):
# wait for stage A (clean pretrain, launched separately) -> archive the
# checkpoint into git-tracked artifacts/ -> stage B (combined robust
# fine-tune, scripts/r3_stage_b.sh) -> archive -> final TPU queue
# (bench, Pallas A/B, headline sweep, resync ablation, HiDDeN table) ->
# copy evidence into docs/round3_demo/ and commit. Every landing is
# committed immediately so another restart cannot erase the round.
set -u
cd "$(dirname "$0")/.."

commit_paths() {  # commit_paths <message> <paths...>
    local msg=$1; shift
    for i in 1 2 3 4 5; do
        git add "$@" 2>/dev/null
        if git commit -m "$msg" -- "$@" >/dev/null 2>&1; then
            echo "[chain] committed: $msg"; return 0
        fi
        sleep 15
    done
    echo "[chain] WARNING: could not commit: $msg" >&2
}

# ---- stage A: wait ----
PID=$(cat /tmp/stage_a.pid 2>/dev/null || echo "")
if [ -n "$PID" ]; then
    while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
if [ ! -d results/flagship_r3_clean/model ]; then
    echo "[chain] stage A produced no checkpoint; aborting" >&2
    exit 1
fi
JAX_PLATFORMS=cpu python scripts/archive_ckpt.py save \
    results/flagship_r3_clean/model artifacts/flagship_r3_clean.npz
commit_paths "Archive stage-A clean-pretrain checkpoint (params-only npz)" \
    artifacts/flagship_r3_clean.npz artifacts/flagship_r3_clean.npz.cfg.json

# ---- stage B: combined robust fine-tune ----
bash scripts/r3_stage_b.sh 30 > /tmp/stage_b.log 2>&1
if [ ! -d results/flagship_r3_desync/model ]; then
    echo "[chain] stage B produced no checkpoint; aborting" >&2
    exit 1
fi
JAX_PLATFORMS=cpu python scripts/archive_ckpt.py save \
    results/flagship_r3_desync/model artifacts/flagship_r3_desync.npz
commit_paths "Archive stage-B robust fine-tune checkpoint (params-only npz)" \
    artifacts/flagship_r3_desync.npz artifacts/flagship_r3_desync.npz.cfg.json

# ---- final queue ----
bash scripts/r3_final_queue.sh results/flagship_r3_desync/model \
    > /tmp/r3_queue.log 2>&1 || true

# ---- evidence into the repo ----
for run in eval_r3_final eval_r3_final_nosync; do
    if [ -d "results/$run" ]; then
        mkdir -p "docs/round3_demo/$run"
        cp results/$run/results.csv results/$run/sample_result.txt \
           "docs/round3_demo/$run/" 2>/dev/null
        python scripts/sweep_to_md.py "results/$run/results.csv" \
            > "docs/round3_demo/$run/table.md" 2>/dev/null || true
    fi
done
if [ -d results/hidden_table_r3 ]; then
    python scripts/hidden_table_summary.py results/hidden_table_r3 \
        > docs/round3_demo/hidden_table_r3.md 2>/dev/null || true
    mkdir -p docs/round3_demo/hidden_table_r3
    find results/hidden_table_r3 -name 'validation.csv' -o -name '*.csv' | \
    while read -r f; do
        rel=${f#results/hidden_table_r3/}
        mkdir -p "docs/round3_demo/hidden_table_r3/$(dirname "$rel")"
        cp "$f" "docs/round3_demo/hidden_table_r3/$rel"
    done
fi
commit_paths "Round-3 evidence: headline sweep, resync ablation, HiDDeN table" \
    docs/round3_demo
echo "[chain] done at $(date)"
