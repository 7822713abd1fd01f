"""Full-length generation through the REAL inference app (VERDICT r3 item 3a
"done" criterion): ``scripts/inference_magicdrive.py`` with ``num_frames="full"``
over on-disk ragged scenes must derive the bucket max-T from the dataset, pad +
frame-mask the short scene through ONE compiled program, and write a sample
trimmed back to the scene's TRUE length — not the bucket length.

Reference counterpart: scripts/inference_magicdrive.py + the
configs/magicdrive/inference/fullx* flagship configs (README_OLD.md:218).
"""
import os
import re
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CFG_TEMPLATE = '''
from magicdrive_v2_tpu.config.presets import MV_ORDER_MAP, rflow, xl2_model
from magicdrive_v2_tpu.config.yaml_compose import load_yaml_config

dtype = "fp32"
seed = 0
outputs = {out_dir!r}
num_frames = "full"
image_size = (24, 40)
save_fps = 12
bbox_mode = "all-xyz"
mv_order_map = MV_ORDER_MAP
vae_out_channels = 16
validation_index = [0, 1]
num_sample = 2

model = xl2_model(bbox_mode=bbox_mode, control_skip_temporal=False)
model.update(depth=2, control_depth=1, hidden_size=64, num_heads=4)
model["bbox_embedder_param"].update(class_token_dim=64, proj_dims=[64, 32, 32, 64],
                                    num_heads=4)
model["frame_emb_param"].update(num_heads=4)
model["map_embedder_param"].update(block_out_channels=[8, 16, 24, 32])
model["model_max_length"] = 16
model.pop("from_pretrained", None)

scheduler = rflow(num_sampling_steps=2, cfg_scale=2.0)
text_encoder = dict(type="t5-dummy", model_max_length=16)
vae = dict(micro_frame_size=None, micro_batch_size=None)

_yaml = load_yaml_config({yaml_path!r})
_pipe = _yaml["train_pipeline"]
for _t in _pipe:
    if _t["type"] == "ImageAug3D":
        _t["final_dim"] = [24, 40]
        _t["resize_lim"] = [0.25, 0.25]
    if _t["type"] == "LoadBEVSegmentation":
        _t["xbound"] = [-50.0, 50.0, 1.0]
        _t["ybound"] = [-50.0, 50.0, 1.0]
_split = dict(
    type="NuScenesTDataset", ann_file={ann_file!r}, dataset_root="",
    object_classes=_yaml["object_classes"], view_order=_yaml["view_order"],
    pipeline=_pipe, start_on_keyframe=True, fps=12,
    img_collate_param=dict(template=_yaml["template"], frame_emb="next2top",
                           bbox_mode="all-xyz", bbox_processor_type=2))
dataset = dict(data=dict(train=dict(_split), val=dict(_split)))
'''


def _count_frames(sample_base: str) -> int:
    """save_sample wrote either <base>.mp4 or a dir of per-frame pngs."""
    if os.path.isdir(sample_base):
        return len([f for f in os.listdir(sample_base) if f.endswith(".png")])
    mp4 = sample_base + ".mp4"
    assert os.path.exists(mp4), f"no sample at {sample_base}(.mp4)"
    import imageio
    return len(imageio.mimread(mp4, memtest=False))


@pytest.mark.slow
def test_inference_app_full_length_trims_to_scene(tmp_path):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers_mini_nuscenes import generate

    # raw scene lengths (9, 19) -> 8n+1 micro-frame rule -> 9 / 17 frames;
    # the derived full bucket is 17, scene 0 is the SHORT one (9 valid frames)
    ann_file = generate(str(tmp_path / "nusc"), scene_lengths=(9, 19))
    out_dir = str(tmp_path / "out")
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(CFG_TEMPLATE.format(
        out_dir=out_dir, ann_file=ann_file,
        yaml_path=os.path.join(REPO, "configs/dataset/Nuscenes.yaml")))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="", XLA_FLAGS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/inference_magicdrive.py"),
         str(cfg_path)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    log = proc.stderr + proc.stdout

    m = re.search(r"full-length generation: bucket max-T = (\d+)", log)
    assert m and int(m.group(1)) == 17, log[-2000:]

    n = _count_frames(os.path.join(out_dir, "sample_0_0"))
    assert n == 9, (f"expected the sample trimmed to the scene's 9 valid "
                    f"frames (bucket 17), got {n}")
    # scene 1 is 19 raw frames: NOT on the 8n+1 grid (this config's val split
    # has no micro_frame_size, so the dataset hands the app the ragged clip);
    # pad_model_batch_to_t must snap it down to 17 instead of raising
    n1 = _count_frames(os.path.join(out_dir, "sample_1_0"))
    assert n1 == 17, f"expected the 19-frame scene snapped to 17, got {n1}"


@pytest.mark.slow
def test_wcoda_app_on_real_data(tmp_path):
    """W-CODA benchmark app over on-disk data: the dataset path must thread
    video_length into build_clips and attach seed-stream box latents
    (reference test_magicdrive.py:311-386 two-generator contract)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers_mini_nuscenes import generate

    ann_file = generate(str(tmp_path / "nusc"), scene_lengths=(9, 19))
    out_dir = str(tmp_path / "out")
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(CFG_TEMPLATE.format(
        out_dir=out_dir, ann_file=ann_file,
        yaml_path=os.path.join(REPO, "configs/dataset/Nuscenes.yaml"))
        .replace('num_frames = "full"', "num_frames = 9"))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="", XLA_FLAGS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/test_magicdrive.py"),
         str(cfg_path), "--save-mode", "all-in-one", "--num-samples", "1",
         "--cfg-options", "post.resize=(48,80)", "post.padding=(0,2,0,0)"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    saved = [f for f in os.listdir(out_dir)
             if f.startswith("scene_") or os.path.isdir(os.path.join(out_dir, f))]
    assert saved, (os.listdir(out_dir), proc.stderr[-1500:])


@pytest.mark.slow
def test_wcoda_app_full_length(tmp_path):
    """W-CODA app with num_frames='full': whole ragged scenes pad to the
    derived bucket and the saved sample trims back to the scene's true
    length (previously this path silently generated fixed bucket-length
    windows; advisor r4 finding)."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from helpers_mini_nuscenes import generate

    ann_file = generate(str(tmp_path / "nusc"), scene_lengths=(9, 19))
    out_dir = str(tmp_path / "out")
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(CFG_TEMPLATE.format(
        out_dir=out_dir, ann_file=ann_file,
        yaml_path=os.path.join(REPO, "configs/dataset/Nuscenes.yaml")))

    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="", XLA_FLAGS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/test_magicdrive.py"),
         str(cfg_path), "--save-mode", "all-in-one", "--num-samples", "1",
         "--cfg-options", "post.resize=(48,80)", "post.padding=(0,2,0,0)"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "bucket max-T = 17" in proc.stderr + proc.stdout
    n = _count_frames(os.path.join(out_dir, "scene_0"))
    assert n == 9, f"expected 9 true frames (bucket 17), got {n}"
