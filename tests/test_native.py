"""Native C++ kernels vs numpy/PIL oracles."""
import numpy as np
import pytest

from magicdrive_v2_tpu import native
from magicdrive_v2_tpu.datasets.geometry import (boxes_to_corners,
                                                 trans_boxes_to_view)


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def test_native_builds(lib_ok):
    assert native.available()


def test_boxes_to_corners_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    boxes = np.concatenate([
        rng.uniform(-30, 30, (64, 3)), rng.uniform(0.5, 6, (64, 3)),
        rng.uniform(-np.pi, np.pi, (64, 1)), rng.uniform(0, 1, (64, 2)),
    ], axis=1).astype(np.float32)  # box_dim 9 (velocity tail ignored)
    got = native.boxes_to_corners(boxes)
    want = boxes_to_corners(boxes)
    assert np.allclose(got, want, atol=1e-4)


def test_project_corners_matches_numpy(lib_ok):
    rng = np.random.default_rng(1)
    boxes = np.concatenate([
        rng.uniform(-30, 30, (32, 2)), rng.uniform(-2, 2, (32, 1)),
        rng.uniform(0.5, 6, (32, 3)), rng.uniform(-np.pi, np.pi, (32, 1)),
    ], axis=1).astype(np.float32)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 500.0
    K[0, 2], K[1, 2] = 400.0, 225.0
    l2c = np.array([[0, -1, 0, 0], [0, 0, -1, 1.5], [1, 0, 0, 0], [0, 0, 0, 1]],
                   np.float64)
    trans = K @ l2c
    from magicdrive_v2_tpu.datasets.geometry import shift_box_origin
    corners = boxes_to_corners(shift_box_origin(boxes, (0.5, 0.5, 0.5)))
    got = native.project_corners(corners, trans, proj=True)
    want = trans_boxes_to_view(boxes, trans, None, proj=True)
    assert np.allclose(got, want, atol=1e-2)


def test_fill_polygons_matches_pil(lib_ok):
    rng = np.random.default_rng(2)
    polys = []
    for _ in range(20):
        cx, cy = rng.uniform(20, 180, 2)
        ang = rng.uniform(0, np.pi)
        dx, dy = rng.uniform(3, 25, 2)
        c, s = np.cos(ang), np.sin(ang)
        rect = np.array([[-dx, -dy], [dx, -dy], [dx, dy], [-dx, dy]])
        rect = rect @ np.array([[c, -s], [s, c]]) + [cx, cy]
        polys.append(rect.astype(np.float32))
    canvas_native = np.zeros((200, 200), np.uint8)
    native.fill_polygons(canvas_native, polys)

    from PIL import Image, ImageDraw
    img = Image.fromarray(np.zeros((200, 200), np.uint8))
    d = ImageDraw.Draw(img)
    for p in polys:
        d.polygon(p.round().astype(np.int32).flatten().tolist(), fill=1)
    canvas_pil = np.asarray(img)

    # rasterization conventions differ at edges by <= 1px; compare interiors
    inter = canvas_native & canvas_pil
    union = canvas_native | canvas_pil
    iou = inter.sum() / max(union.sum(), 1)
    assert iou > 0.93, iou
    assert canvas_native.sum() > 100


def test_fill_polygons_empty_and_degenerate(lib_ok):
    canvas = np.zeros((50, 50), np.uint8)
    native.fill_polygons(canvas, [])
    assert canvas.sum() == 0
    # degenerate 2-point polygon is ignored
    native.fill_polygons(canvas, [np.array([[0, 0], [10, 10]], np.float32)])
    assert canvas.sum() == 0
