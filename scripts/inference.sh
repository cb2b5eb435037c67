#!/usr/bin/env bash
# Usage: bash scripts/inference.sh <preset> <checkpoint> <eval_path> [flags]
set -e
python -m flashvtg_tpu.cli infer "$1" --resume "$2" --eval_path "$3" "${@:4}"
