#!/usr/bin/env bash
# Resilient training launcher (ROADMAP #7): the remote TPU worker
# sometimes crashes while compiling large programs (observed round 2 and
# round 3: "TPU worker process crashed or restarted", outages of
# 15-40 min during which enumeration works but execution hangs).
# This wrapper retries with backoff, switching to --resume once the run
# has produced a checkpoint so no epoch is lost.
#
# Usage: scripts/train_resilient.sh <result_dir> <max_retries> \
#            python -m image_in_speech_watermarking_tpu.cli.train ...
# The train args must already include --result_dir <result_dir>.

set -u
RESULT_DIR=$1; shift
MAX_RETRIES=$1; shift

attempt=0
while : ; do
    args=("$@")
    if [ -d "$RESULT_DIR/model" ] || [ -d "$RESULT_DIR/model_latest" ] \
            || [ -d "$RESULT_DIR/model_staging" ]; then
        # model_staging: a finalized-but-unpromoted save from a run that
        # was killed mid-promotion; checkpoint.restore resolves it
        ckpt="$RESULT_DIR/model_latest"
        [ -d "$ckpt" ] || ckpt="$RESULT_DIR/model"
        # strip any --init_from pair; resume supersedes it
        filtered=()
        skip=0
        for a in "${args[@]}"; do
            if [ "$skip" = 1 ]; then skip=0; continue; fi
            if [ "$a" = "--init_from" ] || [ "$a" = "--resume" ]; then
                skip=1; continue
            fi
            filtered+=("$a")
        done
        args=("${filtered[@]}" --resume "$ckpt")
        echo "[resilient] attempt $attempt: resuming from $ckpt"
    else
        echo "[resilient] attempt $attempt: fresh start"
    fi
    "${args[@]}" && { echo "[resilient] run completed"; exit 0; }
    attempt=$((attempt + 1))
    if [ "$attempt" -gt "$MAX_RETRIES" ]; then
        echo "[resilient] giving up after $MAX_RETRIES retries" >&2
        exit 1
    fi
    sleep_s=$((120 * attempt))
    echo "[resilient] run failed; backing off ${sleep_s}s before retry"
    sleep "$sleep_s"
done
