#!/usr/bin/env bash
# Golden-file check (mirror of the reference standalone_eval/eval_sample.sh):
# scores the committed sample predictions against QVHighlights-val GT.
set -e
REF=${REF:-/root/reference}
python -m flashvtg_tpu.eval.cli \
  --submission_path "$REF/standalone_eval/sample_val_preds.jsonl" \
  --gt_path "$REF/data/highlight_val_release.jsonl" \
  --save_path /tmp/sample_val_preds_metrics.json --not_verbose
python - <<'PY'
import json
got = json.load(open('/tmp/sample_val_preds_metrics.json'))['brief']
print(json.dumps(got, indent=1))
PY
