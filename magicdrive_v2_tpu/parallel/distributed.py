"""Multi-host (multi-process) support.

The reference trains over 32 GPUs / 4 nodes with torchrun + NCCL process groups
(reference scripts/sbatch_stage3.sh, magicdrivedit/acceleration/parallel_states.py).
The JAX counterpart is multi-controller SPMD: run the SAME program on every host,
`jax.distributed.initialize()` forms the cluster, the (dp, sp) mesh spans all
hosts' devices, and jit-compiled programs execute collectives over ICI/DCN.

Deployment shape mirrors the reference's: sp groups live WITHIN a host (ICI),
dp spans hosts (DCN) — `local_dp_info` enforces it. Each process loads only the
samples for its own dp rows (rank-sliced sampler) and `make_global_batch`
assembles the per-host shards into global jax.Arrays for the jitted train step.

Everything here is a no-op in a single-process run, so the training apps behave
exactly as before on one host.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# Batch-dict keys that are per-host python scalars (popped before the step),
# never assembled into global arrays.
_SCALAR_KEYS = ("height", "width", "num_frames")


def maybe_initialize() -> bool:
    """Join the JAX cluster if a multi-process run is configured. Must be called
    BEFORE any other JAX backend use (device enumeration included).

    Two modes:
      - explicit (CPU tests / manual clusters): MDV2_DIST_NPROCS > 1 with
        MDV2_DIST_PROCID and MDV2_DIST_COORD (host:port of process 0);
      - auto (TPU pods / GPU clusters with a supported scheduler):
        MDV2_MULTIHOST=1 -> argument-free jax.distributed.initialize().
    Returns True if distributed initialization ran.
    """
    nprocs = int(os.environ.get("MDV2_DIST_NPROCS", "0") or 0)
    auto = os.environ.get("MDV2_MULTIHOST", "") == "1"
    if nprocs <= 1 and not auto:
        return False
    import jax

    if (os.environ.get("JAX_PLATFORMS", "") or "").startswith("cpu"):
        # cross-process collectives on the CPU backend need an explicit
        # implementation; gloo ships with jaxlib
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ.get("MDV2_DIST_COORD",
                                               "localhost:29400"),
            num_processes=nprocs,
            process_id=int(os.environ["MDV2_DIST_PROCID"]))
    else:
        jax.distributed.initialize()
    logger.info("jax.distributed: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                len(jax.local_devices()), len(jax.devices()))
    return True


def local_dp_info(dp: int, sp: int) -> Tuple[int, int]:
    """(dp_local, dp_offset): which of the mesh's dp rows this process's devices
    own, under the process-major device order `make_mesh` uses.

    Requires each sp group to sit within one process (sp | local device count) —
    the reference's deployment shape (sp over NVLink within a node, dp across
    nodes); relaxing it would put the Ulysses exchange on DCN anyway.
    """
    import jax

    nproc = jax.process_count()
    if nproc == 1:
        return dp, 0
    n_local = len(jax.local_devices())
    if n_local % sp != 0:
        raise ValueError(
            f"sp={sp} must divide the per-host device count {n_local}: "
            "sequence-parallel groups cannot span hosts")
    dp_local = n_local // sp
    if dp_local * nproc != dp:
        raise ValueError(f"dp={dp} != {dp_local} local rows x {nproc} processes")
    # make_mesh reshapes jax.devices() (process-major id order) to (dp, sp):
    # process p owns rows [p*dp_local, (p+1)*dp_local)
    devs = jax.devices()
    first_local = devs[jax.process_index() * n_local]
    if first_local.process_index != jax.process_index():
        raise RuntimeError("jax.devices() is not process-major on this backend")
    return dp_local, jax.process_index() * dp_local


def make_global_batch(batch: Dict[str, Any], mesh, *,
                      batch_axis: str = "dp") -> Dict[str, Any]:
    """Assemble each process's local batch rows into global jax.Arrays sharded
    over the mesh's dp axis (leading dim; other dims replicated). Identity in a
    single-process run. Scalar bookkeeping keys pass through unchanged."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return batch
    sharding = NamedSharding(mesh, P(batch_axis))

    def put(x):
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, arr)

    out = {}
    for k, v in batch.items():
        if k in _SCALAR_KEYS or v is None or np.isscalar(v):
            out[k] = v
        elif isinstance(v, dict):
            out[k] = {kk: put(vv) for kk, vv in v.items()}
        else:
            out[k] = put(v)
    return out


def local_rows(global_array, nproc: int, proc_id: int):
    """This process's contiguous row block of a replicated global result (the
    inverse of make_global_batch for outputs that came back replicated, e.g.
    sp_vae latents of a globally assembled pixel batch)."""
    rows = global_array.shape[0] // nproc
    return global_array[proc_id * rows:(proc_id + 1) * rows]


def is_main_process() -> bool:
    import jax

    return jax.process_index() == 0


def startup_barrier(mesh, *, tag: str = "mdv2:startup"):
    """Cluster barrier + collective warm-up (reference torch.distributed.barrier
    at trainer startup): fail fast on a broken cluster and pre-establish the
    collective contexts for every mesh-axis group (full mesh + dp columns + sp
    rows) while all controllers sit at the same point — the transport
    rendezvous (e.g. gloo's ~30 s deadline) must not first fire mid-run when
    one controller is deep in an XLA compile and the others are waiting.
    No-op in a single-process run."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)
    dp, sp = int(mesh.shape["dp"]), int(mesh.shape["sp"])
    warm = jax.device_put(np.zeros((dp, sp), np.float32),
                          NamedSharding(mesh, P("dp", "sp")))
    warm_fn = jax.jit(jax.shard_map(
        lambda x: (jax.lax.psum(x, "dp"), jax.lax.psum(x, "sp"),
                   jax.lax.psum(x, ("dp", "sp"))),
        mesh=mesh, in_specs=P("dp", "sp"),
        out_specs=(P(None, "sp"), P("dp", None), P())))
    jax.block_until_ready(warm_fn(warm))
    logger.info("multi-host barrier passed (%d processes)", jax.process_count())
