"""Perf lab: time + profile the bench step (424p 6-view CFG denoise) on one chip.

Usage:
  python tools/perf_lab.py time             # p50 of chained steps (same as bench.py)
  python tools/perf_lab.py profile          # capture device trace -> /tmp/mdv2_trace
  python tools/perf_lab.py report [dir]     # aggregate op durations from a trace dir

The report parses the perfetto trace.json.gz that jax.profiler writes and sums device
op durations grouped by a normalized op name, so HBM-bound fusions vs matmuls vs
attention are directly visible. See docs/PERF.md for the running history.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_DIR = "/tmp/mdv2_trace"


def _enable_compile_cache():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jaxcache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass


def build_step(chained: int = 2, shape=None, cfg_double: bool = True):
    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    from __graft_entry__ import _fast_init, _flagship_config
    from magicdrive_v2_tpu.models.magicdrive.stdit3 import MagicDriveSTDiT3
    from magicdrive_v2_tpu.pipelines.magicdrive import synthetic_batch

    on_tpu = jax.devices()[0].platform == "tpu"
    if on_tpu:
        num_frames, height, width = shape or (17, 424, 800)
        cfg = _flagship_config(tiny=False, dtype=jnp.bfloat16)
    else:
        num_frames, height, width = 9, 64, 80
        cfg = _flagship_config(tiny=True, dtype=jnp.float32)
    model = MagicDriveSTDiT3(cfg)
    batch = synthetic_batch(cfg, num_frames=num_frames, height=height, width=width,
                            l_txt=60, b=1,
                            map_size=(8, 400, 400) if on_tpu else (8, 80, 80))
    h, w = batch.pop("height"), batch.pop("width")
    params = _fast_init(model, {**batch, "height": h, "width": w})
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)

    if not cfg_double:  # slice-CFG regime (the reference's 848p recipe)
        double = lambda a: a
    else:
        double = lambda a: jnp.concatenate([a, a], axis=0)
    b2 = {k: jax.tree_util.tree_map(double, v) for k, v in batch.items()
          if k not in ("x", "timestep")}
    params = jax.device_put(params)
    b2 = jax.device_put(b2)
    mult = 2 if cfg_double else 1
    z_shape2 = (mult * batch["x"].shape[0],) + tuple(batch["x"].shape[1:])
    cond_cache = jax.jit(lambda p, a: model.apply(
        p, z_shape2, a["y"], a["maps"], a["bbox"], a["cams"], a["rel_pos"],
        method=MagicDriveSTDiT3.encode_conditions))(params, b2)

    def one_step(params, b2, cond_cache, z, t):
        pred = model.apply(params, double(z), double(t), **b2, height=h, width=w,
                           cond_cache=cond_cache)
        if cfg_double:
            cond, uncond = jnp.split(pred, 2, axis=0)
            pred = uncond + 2.0 * (cond - uncond)
        return z + pred.astype(z.dtype) * (1.0 / 30)

    @jax.jit
    def run_chain(params, b2, cond_cache, z, t):
        return jax.lax.fori_loop(
            0, chained, lambda i, z: one_step(params, b2, cond_cache, z, t), z)

    args = (params, b2, cond_cache, batch["x"], batch["timestep"])
    return run_chain, args, chained


def cmd_time(shape=None, cfg_double=True):
    run_chain, args, chained = build_step(chained=4 if shape is None else 1,
                                          shape=shape, cfg_double=cfg_double)
    out = run_chain(*args)
    _ = np.asarray(out[0, 0, 0, 0, :2])
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        out = run_chain(*args)
        _ = np.asarray(out[0, 0, 0, 0, :2])
        times.append((time.perf_counter() - t0) / chained)
    print(f"p50 step: {float(np.median(times)):.4f}s  (all: "
          + " ".join(f"{t:.3f}" for t in times) + ")")


def cmd_vae848(num_frames: int = 232, height: int = 848, width: int = 1600):
    """Measured memory plan for the full-length 848x1600 6-cam VAE ENCODE
    (SURVEY §7 hard part 6 / VERDICT r2 #2): micro_frame_size=8 streaming
    chunks with carried conv caches + micro_batch_size=1 (per-camera batch
    chunking) bound the per-program activations; this measures wall time and
    peak_bytes_in_use for the whole encode on one chip. Reference needs the
    same two levers (vae_cogvideox.py:1347-1374, 1379-1383)."""
    import jax
    import jax.numpy as jnp

    from magicdrive_v2_tpu.models.vae.cogvideox import (
        CogVAEConfig, VideoAutoencoderKLCogVideoX)

    _enable_compile_cache()
    vae = VideoAutoencoderKLCogVideoX(CogVAEConfig(dtype=jnp.bfloat16),
                                      micro_frame_size=8, micro_batch_size=1)
    vae.init(jax.random.PRNGKey(0))
    rng_np = np.random.default_rng(0)
    t0 = time.perf_counter()
    outs = []
    encode = jax.jit(lambda x: vae.encode(x, sample=False))
    for cam in range(6):  # micro_batch_size=1: one camera per encode program
        x = jnp.asarray(rng_np.standard_normal(
            (1, 3, num_frames, height, width)).astype(np.float32),
            jnp.bfloat16)
        z = encode(x)
        outs.append(np.asarray(z[..., :1, :1]))  # sync through the relay
    dt = time.perf_counter() - t0
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
    print(f"vae848 encode 6x{num_frames}f {height}x{width}: {dt:.1f}s total "
          f"({dt / 6:.1f}s/cam), latent T'={z.shape[2]}, "
          f"peak_mem={peak:.2f} GB")


def cmd_profile(shape=None, cfg_double=True):
    import jax
    run_chain, args, chained = build_step(chained=1, shape=shape,
                                          cfg_double=cfg_double)
    out = run_chain(*args)  # compile outside the trace
    _ = np.asarray(out[0, 0, 0, 0, :2])
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        out = run_chain(*args)
        _ = np.asarray(out[0, 0, 0, 0, :2])
    print("trace written to", TRACE_DIR)
    cmd_report(TRACE_DIR)


def cmd_train_profile(shape=None):
    """Device trace of ONE fwd+bwd train step (VERDICT r3 weak #4: find where
    the 27%-of-peak goes — remat recompute share? chunked-attn backward?).
    Reuses bench.build_train_step (dots remat, full-remat fallback)."""
    import jax

    import bench

    _enable_compile_cache()
    tiny = os.environ.get("MDV2_PERF_TINY") == "1"  # CPU smoke of this command
    num_frames, height, width = shape or ((5, 24, 40) if tiny else (17, 224, 400))
    step, params, batch, remat_used, plan_mem = bench.build_train_step(
        num_frames, height, width, tiny=tiny)
    loss, _gn = step(params, batch, jax.random.PRNGKey(0))  # outside trace
    _ = float(loss)
    print(f"train step compiled: remat={remat_used}, plan_mem={plan_mem} GB")
    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        loss, _gn = step(params, batch, jax.random.PRNGKey(1))
        _ = float(loss)
    print("trace written to", TRACE_DIR)
    cmd_report_ops(TRACE_DIR)


_NORM = [
    (re.compile(r"^fusion(\.\d+)?$"), "fusion"),
    (re.compile(r"^loop_"), "loop_fusion"),
]


def _load_events(trace_dir):
    files = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def cmd_report(trace_dir=TRACE_DIR, top=40):
    events = _load_events(trace_dir)
    # device op events: pid/tid mapped to TPU core lanes; keep complete events w/ dur
    by_name = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    # find pids whose process_name mentions TPU / device
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        args = e.get("args") or {}
        # prefer the hlo op name/category when present
        key = args.get("hlo_category") or name
        dur = e["dur"] / 1e3  # us -> ms
        by_name[key] += dur
        counts[key] += 1
        total += dur
    print(f"device pids: {sorted(dev_pids)} ({ {p: pid_names.get(p) for p in dev_pids} })")
    print(f"total device op time: {total:.1f} ms")
    for name, dur in by_name.most_common(top):
        print(f"{dur:9.2f} ms  x{counts[name]:<5d} {name[:110]}")


def cmd_report_ops(trace_dir=TRACE_DIR, top=60):
    """Group by individual hlo op name (finer than category)."""
    events = _load_events(trace_dir)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    by_name = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # strip trailing .N indices so repeated fusions group
        key = re.sub(r"\.\d+$", "", name)
        by_name[key] += e["dur"] / 1e3
        counts[key] += 1
    for name, dur in by_name.most_common(top):
        print(f"{dur:9.2f} ms  x{counts[name]:<5d} {name[:120]}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "time":
        cmd_time()
    elif cmd == "time848":
        # high-res datapoint: single-pass step at 848x1600x17f (the reference
        # runs slice-CFG here, so one model call == one CFG half)
        cmd_time(shape=(17, 848, 1600), cfg_double=False)
    elif cmd == "time424full":
        # full-scene datapoint: 232 frames (the reference's full-length 424p
        # needs 40.7 GB at sp=1 on an H20; slice-CFG single pass)
        cmd_time(shape=(232, 424, 800), cfg_double=False)
    elif cmd == "vae848":
        cmd_vae848()
    elif cmd == "profile":
        cmd_profile()
    elif cmd == "profile848":
        cmd_profile(shape=(17, 848, 1600), cfg_double=False)
    elif cmd == "trainprofile":
        cmd_train_profile()
    elif cmd == "trainprofile424":
        cmd_train_profile(shape=(17, 424, 800))
    elif cmd == "report":
        cmd_report(sys.argv[2] if len(sys.argv) > 2 else TRACE_DIR)
    elif cmd == "ops":
        cmd_report_ops(sys.argv[2] if len(sys.argv) > 2 else TRACE_DIR)
    else:
        raise SystemExit(f"unknown cmd {cmd}")
