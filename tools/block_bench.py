"""Microbench one MVSTDiTBlock at the 424p bench shape, fused vs XLA attention.

Usage: python tools/block_bench.py [spatial|temporal|both]
Isolates per-block cost without the 25-minute full-model compile through the
axon relay. MDV2_FUSED_ATTN toggles inside one process via env set before the
jit trace of each variant.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import (MVSTDiTBlock,
                                                            DEFAULT_MV_ORDER_MAP)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    B, T, S, C = 12, 5, 1350, 1152
    nbr = tuple(tuple(v) for v in DEFAULT_MV_ORDER_MAP.values())
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, S, C), jnp.bfloat16))(key)
    y = jax.jit(lambda k: jax.random.normal(k, (B, 1, 72, C), jnp.bfloat16))(key)
    t = jax.jit(lambda k: jax.random.normal(k, (2, 6 * C), jnp.bfloat16))(key)

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    variants = []
    if which in ("spatial", "both"):
        variants += [("spatial fused", False, "1"), ("spatial xla", False, "0")]
    if which in ("temporal", "both"):
        variants += [("temporal fused", True, "1"), ("temporal xla", True, "0")]

    for name, temporal, fused in variants:
        os.environ["MDV2_FUSED_ATTN"] = fused
        blk = MVSTDiTBlock(hidden_size=C, num_heads=16, qk_norm=True,
                           temporal=temporal, neighbors=nbr, dtype=jnp.bfloat16)
        params = None

        def init_and_run(x, y, t):
            p = blk.init(jax.random.PRNGKey(1), x, y, t, None, None)
            return p

        params = jax.jit(init_and_run)(x, y, t)

        @jax.jit
        def chain(params, x, y, t):
            def body(i, acc):
                o = blk.apply(params, acc, y, t, None, None)
                return o
            return jax.lax.fori_loop(0, 8, body, x)

        # sync via a device->host scalar read: block_until_ready does not
        # actually block through the axon relay (docs/PERF.md)
        t0 = time.perf_counter()
        out = chain(params, x, y, t)
        _ = np.asarray(out[0, 0, 0, :2])
        print(f"{name}: compile+8 iters {time.perf_counter()-t0:.1f}s", flush=True)
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            out = chain(params, x, y, t)
            _ = np.asarray(out[0, 0, 0, :2])
            ts.append((time.perf_counter() - t0) / 8)
        print(f"{name}: {np.median(ts)*1e3:8.2f} ms/block", flush=True)


if __name__ == "__main__":
    main()


def profile_one(temporal=False, fused="1"):
    import jax
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import (MVSTDiTBlock,
                                                            DEFAULT_MV_ORDER_MAP)
    os.environ["MDV2_FUSED_ATTN"] = fused
    B, T, S, C = 12, 5, 1350, 1152
    nbr = tuple(tuple(v) for v in DEFAULT_MV_ORDER_MAP.values())
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (B, T, S, C), jnp.bfloat16))(key)
    y = jax.jit(lambda k: jax.random.normal(k, (B, 1, 72, C), jnp.bfloat16))(key)
    t = jax.jit(lambda k: jax.random.normal(k, (2, 6 * C), jnp.bfloat16))(key)
    blk = MVSTDiTBlock(hidden_size=C, num_heads=16, qk_norm=True,
                       temporal=temporal, neighbors=nbr, dtype=jnp.bfloat16)
    params = jax.jit(lambda x, y, t: blk.init(jax.random.PRNGKey(1), x, y, t,
                                              None, None))(x, y, t)

    @jax.jit
    def chain(params, x, y, t):
        return jax.lax.fori_loop(
            0, 8, lambda i, a: blk.apply(params, a, y, t, None, None), x)

    out = chain(params, x, y, t)
    _ = np.asarray(out[0, 0, 0, :2])
    tdir = f"/tmp/mdv2_blocktrace_{'t' if temporal else 's'}{fused}"
    os.makedirs(tdir, exist_ok=True)
    with jax.profiler.trace(tdir):
        out = chain(params, x, y, t)
        _ = np.asarray(out[0, 0, 0, :2])
    print("trace ->", tdir)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "profile":
    profile_one(temporal=(len(sys.argv) > 3 and sys.argv[3] == "t"), fused=sys.argv[2] if len(sys.argv) > 2 else "1")
