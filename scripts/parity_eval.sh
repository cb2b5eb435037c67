#!/usr/bin/env bash
# Accuracy-gate runbook (BASELINE.md): evaluate a checkpoint and check
# R1@0.5 / R1@0.7 / mAP against expected values at the ±0.1 gate.
#
# Works with BOTH checkpoint formats:
#   * a reference torch .ckpt (Model Zoo download) — converted on the fly
#     by cli.py's torch-checkpoint path (utils/torch_convert.py)
#   * an orbax checkpoint dir produced by this framework's training
#
# Usage:
#   scripts/parity_eval.sh PRESET CKPT ANN_JSONL VFEAT_DIR TFEAT_DIR \
#       EXPECTED_R1@0.5 EXPECTED_R1@0.7 EXPECTED_mAP [extra cli flags...]
#
# Example (once real features + a Model Zoo ckpt are on disk):
#   scripts/parity_eval.sh qvhighlights_slowclip ckpts/qvh_slowclip.ckpt \
#       data/highlight_val_release.jsonl features/slowfast_clip \
#       features/clip_text 65.71 54.06 49.85
#
# Exit code 0 = all three metrics within 0.1 of expected; 1 otherwise.
set -euo pipefail

if [ $# -lt 8 ]; then
    grep '^#' "$0" | head -20
    exit 2
fi

PRESET=$1; CKPT=$2; ANN=$3; VDIR=$4; TDIR=$5
EXP_R105=$6; EXP_R107=$7; EXP_MAP=$8
shift 8

python -m flashvtg_tpu.cli infer "$PRESET" \
    --resume "$CKPT" --eval_path "$ANN" \
    --v_feat_dirs "$VDIR" --t_feat_dir "$TDIR" "$@" 1>&2

# cli infer writes its artifacts next to the checkpoint, tagged "infer"
CKPT_DIR=$(dirname "$CKPT")
METRICS=$(ls -t "$CKPT_DIR"/infer_*preds_metrics.json 2>/dev/null | head -1)
if [ -z "$METRICS" ]; then
    echo "no metrics json produced in $CKPT_DIR (eval split without GT?)" >&2
    exit 2
fi

python - "$METRICS" "$EXP_R105" "$EXP_R107" "$EXP_MAP" <<'EOF'
import json
import sys

metrics_path, e05, e07, emap = (
    sys.argv[1], float(sys.argv[2]), float(sys.argv[3]), float(sys.argv[4])
)
brief = json.load(open(metrics_path))["brief"]
rows = [
    ("MR-full-R1@0.5", brief["MR-full-R1@0.5"], e05),
    ("MR-full-R1@0.7", brief["MR-full-R1@0.7"], e07),
    ("MR-full-mAP", brief["MR-full-mAP"], emap),
]
GATE = 0.1
print(f"{'metric':<16} {'got':>8} {'expected':>9} {'delta':>8}  gate(±{GATE})")
ok = True
for name, got, want in rows:
    d = got - want
    verdict = "PASS" if abs(d) <= GATE else "FAIL"
    ok &= verdict == "PASS"
    print(f"{name:<16} {got:>8.2f} {want:>9.2f} {d:>+8.2f}  {verdict}")
print("overall:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
EOF
