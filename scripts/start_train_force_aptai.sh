#!/usr/bin/env bash
# Blessed FORCE-APTAI configuration (reference train/start_train_force_aptai.sh)
python -m aptai_tpu.train.train_force_aptai \
  --no-laptop \
  --logging \
  --pr_model_path='experiments/phoneme_recognizer/best' \
  --target_metric='val_mean_rmse' \
  --no-target_metric_bigger_better \
  --prefix='Final' \
  --num_epochs=60 \
  --num_warmup_epochs=5 \
  --num_static_epochs=15 \
  --batch_size=5 \
  --learning_rate=1e-5 \
  --lr_decay=0.96 \
  --train_val_rate='N' \
  "$@"
