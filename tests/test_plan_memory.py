"""tools/plan_memory.py: the compiled-sharded-memory-plan tool stays runnable.

The real flagship runs (docs/SCALING.md tables, PERF.md full-length 424p
section) take minutes-to-hours per compile; these smokes drive the tool's two
modes end-to-end at --tiny so a refactor can't silently break the evidence
pipeline. Reference anchor: the 424p train bucket runs at sp=4 over four
96 GB H20s (configs/magicdrive/train/stage3_higher-b-v3.1-....py:91)."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_plan(*extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/plan_memory.py"), "--tiny",
         "--sp", "4", "--frames", "9", "--height", "64", "--width", "80",
         *extra],
        capture_output=True, text=True, timeout=840, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("PLAN ")]
    assert line, proc.stdout[-2000:]
    return json.loads(line[-1][len("PLAN "):])


@pytest.mark.heavy
def test_plan_memory_train_mode():
    res = _run_plan("--dp", "2")
    assert res["shape"].endswith("dp=2 sp=4")
    assert res["remat"] == "full"
    assert res["per_device_plan_gb"] >= 0
    # buffer-assignment identity the tool's headline number relies on
    total = (res["per_device_args_gb"] + res["per_device_temp_gb"]
             + res["per_device_out_gb"] - res["per_device_alias_gb"])
    assert abs(total - res["per_device_plan_gb"]) < 0.05


@pytest.mark.heavy
def test_plan_memory_infer_mode():
    res = _run_plan("--infer", "--dp", "2")  # --infer forces dp=1
    assert "fwd-only dp=1 sp=4" in res["shape"]
    assert "remat" not in res
    assert res["per_device_plan_gb"] >= 0
