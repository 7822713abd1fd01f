#!/bin/bash
# End-to-end data prep (reference tools/prepare_data/prepare_dataset.sh):
# 12Hz infos + instance ids + BEV map caches.
set -e
ROOT=${ROOT:-./data/nuscenes}
OUT=${OUT:-./data/nuscenes_mmdet3d-12Hz}
VERSION=${VERSION:-v1.0-trainval}

python tools/prepare_data/nuscenes_converter.py --dataroot "$ROOT" \
    --version "$VERSION" --out-dir "$OUT" --hz 12
for SPLIT in train val; do
  python tools/prepare_map_aux.py --dataroot "$ROOT" \
      --info-file "$OUT/nuscenes_interp_12Hz_infos_${SPLIT}_with_bid.pkl" \
      --out-file "$OUT/nuscenes_map_aux_12Hz_${SPLIT}_8x400x400.h5" \
      --bound -50 50 0.25
done
