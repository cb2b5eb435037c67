#!/usr/bin/env bash
set -e
python -m flashvtg_tpu.cli train tacos \
  --v_feat_dirs "$1" --t_feat_dir "$2" --exp_id "${EXP_ID:-exp}" "${@:3}"
