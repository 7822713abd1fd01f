#!/bin/bash
# Shard the pedestrian pipeline over N host workers (reference
# run_pipeline_12hz_parallel.sh shards over 8 GPUs; the pipeline is CPU/renderer
# bound, so shard over processes here).
set -e
N=${N:-8}
SCENES=${SCENES:-850}
PASS=${PASS:-harvest}
for ((w=0; w<N; w++)); do
  (for ((i=w; i<SCENES; i+=N)); do
     python scripts/pipeline_12hz.py --scene-idx "$i" --pass "$PASS" "$@" || true
   done) &
done
wait
