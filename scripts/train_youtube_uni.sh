#!/usr/bin/env bash
# YouTube-HL; one run per domain
set -e
for domain in ${DOMAINS:-dog gymnastics parkour skating skiing surfing}; do
  python -m flashvtg_tpu.cli train youtube_uni \
    --v_feat_dirs "$1" --t_feat_dir "$2" --dset_domain "$domain" \
    --exp_id "${EXP_ID:-exp}-$domain" "${@:3}"
done
