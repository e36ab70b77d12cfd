#!/usr/bin/env bash
nohup python -m image_in_speech_watermarking_tpu.cli.hidden_main new \
  --name crop-quant --epochs 300 \
  --noise 'crop((0.2,0.25),(0.2,0.25))+quant()' \
  > crop-quant.log 2>&1 &
