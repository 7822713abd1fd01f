#!/bin/bash
# Multi-host TPU pod launcher (replaces the reference's sbatch_*.sh torchrun/SLURM
# stack, reference sbatch_stage3.sh etc.).
#
# JAX is single-controller-per-host: run the SAME command on every host of the pod
# slice; jax.distributed.initialize() discovers peers through the TPU runtime.
#
# Usage (GCP TPU VM example):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command \
#     "cd magicdrive-v2-tpu && bash scripts/launch_tpu_pod.sh \
#        configs/magicdrive/train/stage3_multires_sp4.py"
set -e
CONFIG=${1:-configs/magicdrive/train/stage2_17x224x400.py}
shift || true

export JAX_PLATFORMS=tpu
# bucket compiles are cached across steps; persistent cache across restarts:
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}

# the train app joins the cluster in-process (parallel/distributed.py
# maybe_initialize -> argument-free jax.distributed.initialize on TPU pods)
export MDV2_MULTIHOST=1
exec python scripts/train_magicdrive.py "$CONFIG" "$@"
