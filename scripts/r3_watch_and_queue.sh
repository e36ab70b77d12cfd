#!/usr/bin/env bash
# Waits for the desync fine-tune (train_resilient.sh, pid file
# /tmp/ft_desync3.pid) to finish, then runs the round-3 TPU job queue.
# Idempotent: refuses to start if the queue already ran/is running.
set -u
cd "$(dirname "$0")/.."

LOCK=/tmp/r3_queue.lock
if [ -e "$LOCK" ]; then
    echo "[watch] queue already started ($LOCK exists)"; exit 0
fi

PIDFILE=${1:-/tmp/ft_desync3.pid}
PID=$(cat "$PIDFILE" 2>/dev/null || echo "")
if [ -n "$PID" ]; then
    while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
# also wait for any straggler trainer writing into the result dir
while [ -n "$(find results/flagship_r3_desync -name '*.lock' 2>/dev/null)" ]; do
    sleep 30
done

if [ ! -d results/flagship_r3_desync/model ]; then
    echo "[watch] fine-tune ended WITHOUT a checkpoint; not queueing" >&2
    exit 1
fi
touch "$LOCK"
echo "[watch] fine-tune done; starting queue at $(date)"
bash scripts/r3_tpu_queue.sh
