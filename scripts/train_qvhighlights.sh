#!/usr/bin/env bash
# QVHighlights MR+HD (mirror of the reference train_qv_slowclip.sh surface)
# Usage: bash scripts/train_qvhighlights.sh <v_feat_dir...> <t_feat_dir> [extra flags]
set -e
python -m flashvtg_tpu.cli train qvhighlights \
  --v_feat_dirs "$1" --t_feat_dir "$2" --exp_id "${EXP_ID:-exp}" "${@:3}"
