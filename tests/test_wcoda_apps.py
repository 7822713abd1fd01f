"""W-CODA test-app coverage: config _base_ inheritance, pedestrian grid-video
loading, and the BrushNet/SDE benchmark apps end-to-end (slow tier).

Reference: scripts/test_magicdrive_brushnet.py / test_magicdrive_sde_brushnet.py
and configs/magicdrive/test/*.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_base_inheritance():
    from magicdrive_v2_tpu.config import Config
    cfg = Config.fromfile(os.path.join(
        REPO, "configs/magicdrive/test/17-16x848x1600_map0_fsp4_cfg2.0_brushnet.py"))
    # child overrides
    assert cfg.model.type == "MagicDriveSTDiT3-XL/2-BrushNet"
    assert cfg.scheduler.type == "rflow-brushnet-slice"
    assert cfg.outputs.endswith("brushnet")
    # deep-merged base values survive
    assert cfg.model.qk_norm is True
    assert cfg.model.force_pad_h_for_sp_size == 4
    assert tuple(cfg.post.resize) == (848, 1600)
    assert cfg.post.cut_length == 16
    assert cfg.use_map0 is True

    sde = Config.fromfile(os.path.join(
        REPO, "configs/magicdrive/test/"
              "17-16x848x1600_map0_fsp4_cfg2.0_sde_brushnet.py"))
    assert sde.model.type == "MagicDriveSTDiT3-XL/2-SDEBrushNet"
    assert sde.scheduler.type == "rflow-sdebrushnet-slice"
    assert sde.scheduler.inpaint_noise_scale == 0.2
    # deep merge kept the base scheduler's sampling params
    assert sde.scheduler.num_sampling_steps == 30


def test_load_grid_video(tmp_path):
    """2x3 camera grid mp4 -> per-view tensors, row-major view order."""
    imageio = pytest.importorskip("imageio")
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from test_magicdrive import load_grid_video

    h, w, T = 16, 24, 4
    # view vi gets constant brightness 40*vi: recoverable after mp4 compression
    frames = []
    for _t in range(T):
        grid = np.zeros((2 * h, 3 * w, 3), np.uint8)
        for vi in range(6):
            r, c = divmod(vi, 3)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = 40 * vi
        frames.append(grid)
    path = tmp_path / "videos.mp4"
    try:
        imageio.mimwrite(str(path), frames, fps=4)
    except Exception as e:  # no ffmpeg backend available
        pytest.skip(f"no mp4 writer: {e}")

    vids = load_grid_video(str(path), T, h, w)
    assert vids.shape == (6, 3, T, h, w)
    for vi in range(6):
        mean_px = (vids[vi].mean() + 1) * 127.5
        assert abs(mean_px - 40 * vi) < 6, (vi, mean_px)

    masks = load_grid_video(str(path), T, h, w, grayscale=True)
    assert masks.shape == (6, 1, T, h, w)
    assert set(np.unique(masks)) <= {0.0, 1.0}
    # brightness 40*vi > 127 only for views 4,5 (160, 200)
    assert masks[0].max() == 0 and masks[5].min() == 1


@pytest.mark.slow
@pytest.mark.parametrize("variant", ["brushnet", "sde"])
def test_wcoda_inpaint_app_e2e(tmp_path, variant):
    """Drive the W-CODA BrushNet/SDE apps with synthetic inputs on CPU."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="", XLA_FLAGS="")
    script = ("scripts/test_magicdrive_brushnet.py" if variant == "brushnet"
              else "scripts/test_magicdrive_sde_brushnet.py")
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, script),
         os.path.join(REPO, "configs/magicdrive/test/smoke_tiny_brushnet.py"),
         "--synthetic", "--num-frames", "9",
         "--cfg-options", f"outputs={out_dir}",
         "scheduler.num_sampling_steps=2"],
        capture_output=True, text=True, timeout=560, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    saved = os.listdir(out_dir)
    assert saved, "no outputs written"
