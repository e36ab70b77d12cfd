#!/usr/bin/env bash
# Round-5 pilot/seam stage queue — run AFTER scripts/r5_queue.sh
# releases the chip:
#   1. fine-tune pw2 with seam-pair channel + in-band pilot (~1h)
#   2. archive the checkpoint
#   3. pilot-profile calibration probe (landscape measurements)
#   4. desync-row probe with pilot-driven sync (the rows the pilot is
#      supposed to fix) + clean row as control
set -x
cd "$(dirname "$0")/.."
NEPOCH=${1:-24}

bash scripts/r5_stage_pilot.sh "$NEPOCH"

JAX_PLATFORMS=cpu python scripts/archive_ckpt.py save \
    results/flagship_r5_pilot/model artifacts/flagship_r5_pilot.npz || true

python scripts/r5_pilot_calibration.py results/flagship_r5_pilot/model 1 \
    2>&1 | tail -60

python -m image_in_speech_watermarking_tpu.cli.evaluate \
    --checkpoint results/flagship_r5_pilot/model --extractor_mag \
    --wm_pilot --size 5 --splits test --resync \
    --attacks "closed_loop,awgn-15,jittering-1000,time_scaling-0.9,time_scaling-1.1,pitch_scaling,time_shift-1000" \
    --result_dir results/eval_r5_pilot_probe 2>&1 | tail -20
