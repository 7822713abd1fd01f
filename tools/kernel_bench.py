"""Microbench: fused_qkv_attention vs the XLA attention path at bench shapes."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_v2_tpu.ops.flash_fused import fused_qkv_attention, _xla_reference

G, N, H, D = 60, 1350, 16, 72
LOOP = 20


def timed(f, *args):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / 3


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    qkv = jnp.asarray(rng.standard_normal((G, N, 3, H, D), np.float32), dt)
    qw = jnp.asarray(rng.standard_normal((D,), np.float32) * 0.1 + 1.0)
    kw = jnp.asarray(rng.standard_normal((D,), np.float32) * 0.1 + 1.0)
    perm = np.roll(np.arange(G), 1).astype(np.int32)

    # loop on device to amortize dispatch
    def chain(f):
        def run(qkv):
            def body(i, acc):
                o = f(qkv + acc[:, :, None, 0:1, 0:1] * 0)  # keep data dep
                return acc + o.astype(acc.dtype) * 1e-6
            z = jnp.zeros((G, N, H, D), dt)
            return jax.lax.fori_loop(0, LOOP, body, z)
        return jax.jit(run)

    for name, f in [
        ("fused self+norm", lambda x: fused_qkv_attention(x, qw, kw)),
        ("fused self nonorm", lambda x: fused_qkv_attention(x, None, None)),
        ("fused perm+norm", lambda x: fused_qkv_attention(x, qw, kw, tuple(perm))),
        ("xla composition", lambda x: _xla_reference(x, qw, kw, None, D ** -0.5)),
    ]:
        try:
            t = timed(chain(f), qkv) / LOOP
            print(f"{name:20s} {t*1e3:8.2f} ms")
        except Exception as e:
            print(f"{name:20s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # correctness vs reference
    a = np.asarray(fused_qkv_attention(qkv, qw, kw), np.float32)
    b = np.asarray(_xla_reference(qkv, qw, kw, None, D ** -0.5), np.float32)
    print("self+norm max abs diff:", np.abs(a - b).max())
    a = np.asarray(fused_qkv_attention(qkv, None, None, tuple(perm)), np.float32)
    b = np.asarray(_xla_reference(qkv, None, None, perm, D ** -0.5), np.float32)
    print("perm nonorm max abs diff:", np.abs(a - b).max())


if __name__ == "__main__":
    main()
