#!/usr/bin/env bash
nohup python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
  --name quant --epochs 300 --noise 'quant()' \
  > quant.log 2>&1 &
