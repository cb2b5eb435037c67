#!/usr/bin/env bash
# Charades-STA with InternVideo2 features (reference scripts/charades_sta_internvideo2/)
set -e
python -m flashvtg_tpu.cli train charades_internvideo2 \
  --v_feat_dirs "$1" --t_feat_dir "$2" --exp_id "${EXP_ID:-exp}" "${@:3}"
