#!/usr/bin/env bash
# Periodic checkpoint persistence daemon: every INTERVAL seconds,
# archive the freshest results/*/model checkpoint into git-tracked
# artifacts/wip_<run>.npz (float16, params-only) and commit it. Two VM
# restarts have wiped gitignored results/ mid-round; this bounds the
# loss to one interval. Stop with: kill $(cat /tmp/ckpt_daemon.pid)
set -u
cd "$(dirname "$0")/.."
INTERVAL=${1:-2400}
echo $$ > /tmp/ckpt_daemon.pid

while : ; do
    sleep "$INTERVAL"
    newest=""
    for d in results/*/model; do
        [ -d "$d" ] || continue
        [ -z "$newest" ] || [ "$d" -nt "$newest" ] && newest="$d"
    done
    [ -z "$newest" ] && continue
    run=$(basename "$(dirname "$newest")")
    out="artifacts/wip_${run}.npz"
    if JAX_PLATFORMS=cpu python scripts/archive_ckpt.py save --f16 \
        "$newest" "$out" >> /tmp/ckpt_daemon.log 2>&1; then
        for i in 1 2 3; do
            git add "$out" "$out.cfg.json" 2>/dev/null && \
            git commit -m "Snapshot in-flight $run checkpoint to artifacts" \
                -- "$out" "$out.cfg.json" >/dev/null 2>&1 && break
            sleep 20
        done
    fi
done
