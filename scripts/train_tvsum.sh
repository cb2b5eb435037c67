#!/usr/bin/env bash
# TVSum HD; one run per domain: BK BT DS FM GA MS PK PR VT VU
set -e
for domain in ${DOMAINS:-BK BT DS FM GA MS PK PR VT VU}; do
  python -m flashvtg_tpu.cli train tvsum \
    --v_feat_dirs "$1" --t_feat_dir "$2" --dset_domain "$domain" \
    --exp_id "${EXP_ID:-exp}-$domain" "${@:3}"
done
