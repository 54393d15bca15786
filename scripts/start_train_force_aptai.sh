#!/usr/bin/env bash
# Blessed FORCE-APTAI configuration (reference train/start_train_force_aptai.sh)
#
# Defaults are reference-exact (frame path = final tower hidden state).
# If the recognizer at --pr_model_path was trained FROM SCRATCH (no
# speech-pretrained init), add `--frame_hidden_layer 0`: deep from-scratch
# CTC towers warp their final layers toward emission timing, and reading
# the pre-transformer projection output instead moved held-out alignment
# FER 0.768->0.538 and TV Pearson 0.733->0.964 at production topology
# (benchmarks/PERF.md round 5).  Optional alignment knobs:
# --off_diag_prior [--prior_g 0.2] --blank_logprob -1 \
# --energy_temperature 1.0 --aux_frame_ce 0.0
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
