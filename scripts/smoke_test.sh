#!/usr/bin/env bash
# Smoke tier (VERDICT r4 next-step #7): a curated <3-minute subset that
# touches every layer — dsp numerics (torch oracle), attack
# jit+grad, model contracts, eval metrics + sync search, pilot, hidden
# trainer contract, checkpointing, native audio IO, PESQ — using only
# small/tiny-config compiles (the full default tier's wall time is
# dominated by flagship-sized compiles: test_uformer_audio_grads 296 s,
# module fixtures ~110 s; those belong to scripts/ci_test.sh).
#
#   scripts/smoke_test.sh          # <3 min
#   scripts/ci_test.sh             # full default tier (~12 min idle)
#   scripts/ci_test.sh --slow      # + slow tier
set -eu
cd "$(dirname "$0")/.."

export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
export JAX_PLATFORMS=cpu

exec python -m pytest -q \
    tests/test_stft.py::test_roundtrip_identity \
    "tests/test_stft.py::test_stft_matches_torch[matmul-cfg0]" \
    "tests/test_stft.py::test_istft_matches_torch[cfg0]" \
    tests/test_attacks.py::test_attacks_jit_and_grad \
    tests/test_models.py::test_model_a_contract \
    tests/test_eval.py::test_metric_formulas \
    tests/test_eval.py::test_reconstruct_audio_chain \
    tests/test_sync.py::test_offset_search_recovers_exact_shift \
    tests/test_sync.py::test_confidence_prefers_saturated_consistent_decodes \
    tests/test_pilot.py::test_pilot_pattern_shape_and_blocks \
    tests/test_pilot.py::test_stamp_pilot_overwrites_corner_only \
    tests/test_pilot.py::test_pilot_scoring_separates_aligned_from_garbage \
    tests/test_hidden_trainer.py::test_validate_on_batch_contract \
    tests/test_checkpoint_guard.py \
    tests/test_native.py \
    tests/test_pesq.py \
    tests/test_submissions.py \
    "$@"
