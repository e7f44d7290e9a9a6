#!/bin/bash
cd /root/repo
set -x
date
timeout 3600 python -m janus_tpu.train.retrain_demo --what tts --tts-steps 12000 \
  > logs/r5_tts_b.log 2>&1
echo "tts exit: $?"
date
timeout 5400 python -m janus_tpu.train.retrain_demo --what tts_hard --hard-tts-steps 16000 \
  > logs/r5_tts_hard.log 2>&1
echo "tts_hard exit: $?"
date
timeout 5400 python -m janus_tpu.train.retrain_demo --what asr_hard --hard-steps 8000 --hard-warm-start \
  > logs/r5_asr_hard.log 2>&1
echo "asr_hard exit: $?"
date
echo "PIPELINE DONE"
