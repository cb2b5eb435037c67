#!/usr/bin/env bash
# Charades-STA (InternVideo2 features; use preset charades_vgg for VGG+GloVe)
set -e
python -m flashvtg_tpu.cli train charades \
  --v_feat_dirs "$1" --t_feat_dir "$2" --exp_id "${EXP_ID:-exp}" "${@:3}"
