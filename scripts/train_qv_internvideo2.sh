#!/usr/bin/env bash
# QVHighlights with InternVideo2 features (reference scripts/qv_internvideo2/,
# 5-stride pyramid via data/MR_16.py-equivalent preset)
set -e
python -m flashvtg_tpu.cli train qv_internvideo2 \
  --v_feat_dirs "$1" --t_feat_dir "$2" --exp_id "${EXP_ID:-exp}" "${@:3}"
