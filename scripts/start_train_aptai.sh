#!/usr/bin/env bash
# Blessed APTAI configuration (reference train/start_train_aptai.sh).
# Throughput note: batch_size 5 is the reference protocol; for production
# DP runs the measured per-chip optimum is --batch_size=16 (+16% audio-s/s,
# benchmarks/PERF.md "Training batch sweep") — pass it via "$@".
python -m aptai_tpu.train.train_aptai \
  --no-laptop \
  --no-logging \
  --huggingface_model_id='facebook/wav2vec2-large-robust' \
  --target_metric='val_mean_rmse' \
  --no-target_metric_bigger_better \
  --prefix='init' \
  --num_epochs=20 \
  --num_warmup_epochs=2 \
  --num_static_epochs=8 \
  --batch_size=5 \
  --learning_rate=1e-5 \
  --lr_decay=0.96 \
  --train_val_rate='both' \
  "$@"
