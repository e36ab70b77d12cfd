#!/usr/bin/env bash
nohup python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
  --name no-noise --epochs 300 --noise '' \
  > no-noise.log 2>&1 &
