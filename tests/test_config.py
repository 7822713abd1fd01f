import os
import textwrap

from magicdrive_v2_tpu.config import Config, load_yaml_config, merge_dot_options


def test_python_config_roundtrip(tmp_path):
    p = tmp_path / "exp.py"
    p.write_text(textwrap.dedent("""
        lr = 8e-5
        model = dict(type="MagicDriveSTDiT3-XL/2", depth=28, patch_size=(1, 2, 2))
        mask_ratios = {"random": 0.01}
        sp_size = 4
        plugin = "zero2-seq" if sp_size > 1 else "zero2"
    """))
    cfg = Config.fromfile(str(p))
    assert cfg.lr == 8e-5
    assert cfg.model.type == "MagicDriveSTDiT3-XL/2"
    assert cfg.model.patch_size == (1, 2, 2)
    assert cfg.plugin == "zero2-seq"


def test_dot_overrides():
    cfg = Config(model=dict(depth=28, inner=dict(x=1)), lr=1e-4)
    merge_dot_options(cfg, ["model.depth=2", "model.inner.x=[1,2]", "lr=5e-5", "name=abc"])
    assert cfg.model.depth == 2
    assert cfg.model.inner.x == [1, 2]
    assert cfg.lr == 5e-5
    assert cfg.name == "abc"


def test_yaml_interpolation(tmp_path):
    p = tmp_path / "ds.yaml"
    p.write_text(textwrap.dedent("""
        image_size: [224, 400]
        augment2d:
          resize: [[0.25, 0.3]]
        object_classes: [car, truck]
        train_pipeline:
          - type: ImageAug3D
            final_dim: ${...image_size}
            resize_lim: ${...augment2d.resize[0]}
          - type: ObjectNameFilter
            classes: ${...object_classes}
        data:
          train:
            pipeline: ${...train_pipeline}
    """))
    doc = load_yaml_config(str(p))
    assert doc["train_pipeline"][0]["final_dim"] == [224, 400]
    assert doc["train_pipeline"][0]["resize_lim"] == [0.25, 0.3]
    assert doc["train_pipeline"][1]["classes"] == ["car", "truck"]
    assert doc["data"]["train"]["pipeline"][0]["final_dim"] == [224, 400]


def test_reference_dataset_yaml_if_present():
    path = "/root/reference/configs/dataset/Nuscenes.yaml"
    if not os.path.isfile(path):
        return
    doc = load_yaml_config(path)
    assert doc["train_pipeline"][2]["final_dim"] == [224, 400]
    assert doc["data"]["train"]["object_classes"][0] == "car"
    assert doc["neighboring_view_pair"][0] == [5, 1]
