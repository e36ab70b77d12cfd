#!/usr/bin/env bash
# Waits for the stage-C fine-tune (train_resilient.sh, pid file
# /tmp/ft_stage_c.pid) to finish, then runs the round-3 TPU job queue
# on the freshest flagship checkpoint (stage C if it produced one,
# otherwise the stage-B desync model).
# Idempotent: refuses to start if the queue already ran/is running.
set -u
cd "$(dirname "$0")/.."

LOCK=/tmp/r3_queue.lock
if [ -e "$LOCK" ]; then
    echo "[watch] queue already started ($LOCK exists)"; exit 0
fi

PIDFILE=${1:-/tmp/ft_stage_c.pid}
PID=$(cat "$PIDFILE" 2>/dev/null || echo "")
if [ -n "$PID" ]; then
    while kill -0 "$PID" 2>/dev/null; do sleep 60; done
fi
# also wait for any straggler trainer writing into the result dirs
while [ -n "$(find results/flagship_r3_final results/flagship_r3_desync -name '*.lock' 2>/dev/null)" ]; do
    sleep 30
done

CKPT=results/flagship_r3_final/model
if [ ! -d "$CKPT" ]; then
    CKPT=results/flagship_r3_desync/model
    echo "[watch] stage C produced no checkpoint; falling back to $CKPT" >&2
fi
if [ ! -d "$CKPT" ]; then
    echo "[watch] no flagship checkpoint at all; not queueing" >&2
    exit 1
fi
touch "$LOCK"
echo "[watch] fine-tune done; starting queue at $(date) with $CKPT"
bash scripts/r3_tpu_queue.sh "$CKPT"
