#!/usr/bin/env bash
# Canonical HiDDeN combined-noise training run (hidden/runfiles parity:
# the 4 nohup invocations with canonical noise configs).
nohup python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
  --name combined-noise --epochs 400 \
  --noise 'crop((0.4,0.55),(0.4,0.55))+cropout((0.25,0.35),(0.25,0.35))+dropout(0.25,0.35)+resize(0.4,0.6)+jpeg()' \
  > combined-noise.log 2>&1 &
