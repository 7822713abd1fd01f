"""magicdrive_v2_tpu: a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
MagicDrive-V2 (multi-view autonomous-driving video generation).

This is a ground-up re-design for TPU: Flax modules compiled by XLA, Pallas kernels for
the hot attention paths, `jax.sharding` meshes for data/sequence parallelism, and
`lax.scan`-structured control flow (denoise loops, causal-conv streaming, layer stacks).

Reference capability map: see SURVEY.md (reference repo HerrWangkv/MagicDrive-V2).
"""

__version__ = "0.1.0"

from . import registry  # noqa: F401
