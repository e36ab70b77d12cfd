#!/usr/bin/env bash
# Periodic HiDDeN-table persistence daemon: every INTERVAL seconds copy
# each run's train/validation CSVs (+options.json) from gitignored
# results/hidden_table_r3/ into git-tracked docs/round3_demo/
# hidden_table_r3/<run>/ and commit. Three VM restarts have wiped
# results/ mid-round; this bounds the loss to one interval.
# Stop with: kill $(cat /tmp/hidden_csv_daemon.pid)
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-600}
SRC=${2:-results/hidden_table_r3}
DST=${3:-docs/round3_demo/hidden_table_r3}
echo $$ > /tmp/hidden_csv_daemon.pid

while : ; do
    sleep "$INTERVAL"
    [ -d "$SRC" ] || continue
    changed=0
    for d in "$SRC"/*/; do
        [ -d "$d" ] || continue
        run=$(basename "$d" | cut -d' ' -f1)
        mkdir -p "$DST/$run"
        for f in train.csv validation.csv validation_raw.csv options.json; do
            [ -f "$d/$f" ] || continue
            if ! cmp -s "$d/$f" "$DST/$run/$f" 2>/dev/null; then
                cp "$d/$f" "$DST/$run/$f" && changed=1
            fi
        done
    done
    [ "$changed" = 1 ] || continue
    # write to a temp file and mv only on success, so a transient
    # summary failure cannot truncate the last good summary.txt
    if python scripts/hidden_table_summary.py "$SRC" \
            > "$DST/summary.txt.tmp" 2>/dev/null; then
        mv "$DST/summary.txt.tmp" "$DST/summary.txt"
    else
        rm -f "$DST/summary.txt.tmp"
    fi
    for i in 1 2 3; do
        git add "$DST" 2>/dev/null && \
        git commit -m "Snapshot in-flight HiDDeN table CSVs" \
            -- "$DST" >/dev/null 2>&1 && break
        sleep 20
    done
done
