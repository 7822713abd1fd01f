"""ctypes bindings for the native host kernels (native/src/mdv2_native.cpp).

Auto-builds the shared library on first use when a toolchain is present; every
entry point has a pure-numpy fallback so the framework works without the native
build (and the fallbacks double as the test oracle — see tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_TRIED = False
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmdv2_native.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MDV2_DISABLE_NATIVE"):
        return None
    if not os.path.isfile(_SO_PATH):
        try:
            subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            logger.info("native build unavailable (%s); using numpy fallbacks", e)
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError as e:
        logger.info("native lib load failed (%s); using numpy fallbacks", e)
        return None
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    c = ctypes.c_int
    lib.mdv2_fill_polygons.argtypes = [u8p, c, c, f32p, i32p, c, ctypes.c_uint8]
    lib.mdv2_boxes_to_corners.argtypes = [f32p, c, c, f32p]
    lib.mdv2_project_corners.argtypes = [f32p, c, f64p, c, f32p]
    lib.mdv2_raster_aux.argtypes = [f32p, c, c, c, c, c, c, f32p, f32p, f32p, f32p,
                                    ctypes.c_void_p, f32p, c]
    _LIB = lib
    logger.info("native kernels loaded from %s", _SO_PATH)
    return lib


def available() -> bool:
    return _load() is not None


def fill_polygons(canvas: np.ndarray, polys: Sequence[np.ndarray],
                  value: int = 1) -> np.ndarray:
    """Fill polygons (each (P, 2) float xy) into a (h, w) uint8 canvas in-place."""
    assert canvas.dtype == np.uint8 and canvas.ndim == 2
    lib = _load()
    if lib is not None and polys:
        xy = np.ascontiguousarray(np.concatenate([np.asarray(p, np.float32)
                                                  for p in polys]))
        n_pts = np.asarray([len(p) for p in polys], np.int32)
        lib.mdv2_fill_polygons(canvas, canvas.shape[0], canvas.shape[1], xy, n_pts,
                               len(polys), value)
        return canvas
    # fallback: PIL
    from PIL import Image, ImageDraw
    render = Image.fromarray(canvas)
    draw = ImageDraw.Draw(render)
    for p in polys:
        draw.polygon(np.asarray(p).round().astype(np.int32).flatten().tolist(),
                     fill=value)
    canvas[:] = np.asarray(render)
    return canvas


def boxes_to_corners(boxes: np.ndarray) -> np.ndarray:
    lib = _load()
    boxes = np.ascontiguousarray(np.asarray(boxes, np.float32))
    if boxes.shape[0] == 0:
        return np.zeros((0, 8, 3), np.float32)
    if lib is not None:
        out = np.empty((boxes.shape[0], 8, 3), np.float32)
        lib.mdv2_boxes_to_corners(boxes, boxes.shape[0], boxes.shape[1], out)
        return out
    from .datasets.geometry import boxes_to_corners as np_impl
    return np_impl(boxes)


def project_corners(corners: np.ndarray, trans: np.ndarray,
                    proj: bool = True) -> np.ndarray:
    lib = _load()
    corners = np.ascontiguousarray(np.asarray(corners, np.float32))
    trans = np.ascontiguousarray(np.asarray(trans, np.float64).reshape(4, 4))
    if lib is not None:
        out = np.empty_like(corners)
        lib.mdv2_project_corners(corners, corners.shape[0], trans, int(proj), out)
        return out
    n = corners.shape[0]
    coords = np.concatenate([corners.reshape(-1, 3).astype(np.float64),
                             np.ones((n * 8, 1))], axis=-1) @ trans.T
    if proj:
        z = np.clip(coords[:, 2], 1e-5, 1e5)
        coords[:, 0] /= z
        coords[:, 1] /= z
        coords[:, 2] /= np.abs(coords[:, 2])
    return coords[:, :3].reshape(n, 8, 3).astype(np.float32)


def rasterize_mesh(verts: np.ndarray, faces: np.ndarray,
                   colors: Optional[np.ndarray], h: int, w: int,
                   z_near: float = 1e-4):
    """Z-buffered vertex-color triangle rasterization.

    verts: (V, 3) screen-space x, y + camera-space depth z (>0 in front);
    faces: (F, 3) int; colors: (V, 3) float or None (depth/mask only).
    Returns (rgb (h, w, 3) f32, depth (h, w) f32 +inf where empty,
    face_id (h, w) i32, -1 where empty). Screen-space barycentric interpolation
    (the reference's pytorch3d MeshRasterizer defaults for TexturesVertex,
    pedestrian_processor.py:508-647).
    """
    verts = np.ascontiguousarray(np.asarray(verts, np.float32))
    faces = np.ascontiguousarray(np.asarray(faces, np.int32))
    rgb = np.zeros((h, w, 3), np.float32)
    depth = np.full((h, w), np.inf, np.float32)
    face_id = np.full((h, w), -1, np.int32)
    if faces.shape[0] == 0:
        return rgb, depth, face_id
    lib = _load()
    if lib is not None:
        if not hasattr(lib.mdv2_rasterize_mesh, "_typed"):
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
            c = ctypes.c_int
            lib.mdv2_rasterize_mesh.argtypes = [
                f32p, c, i32p, c, ctypes.c_void_p, c, c, ctypes.c_float,
                f32p, f32p, i32p]
            lib.mdv2_rasterize_mesh._typed = True
        col_ptr = None
        if colors is not None:
            colors = np.ascontiguousarray(np.asarray(colors, np.float32))
            col_ptr = colors.ctypes.data_as(ctypes.c_void_p)
        lib.mdv2_rasterize_mesh(verts, verts.shape[0], faces, faces.shape[0],
                                col_ptr, h, w, z_near, rgb, depth, face_id)
        return rgb, depth, face_id
    # numpy fallback: per-face barycentric fill over the face's bounding box
    for f, tri in enumerate(faces):
        a, b, c3 = verts[tri[0]], verts[tri[1]], verts[tri[2]]
        if a[2] <= z_near or b[2] <= z_near or c3[2] <= z_near:
            continue
        x0 = max(0, int(np.floor(min(a[0], b[0], c3[0]))))
        x1 = min(w - 1, int(np.ceil(max(a[0], b[0], c3[0]))))
        y0 = max(0, int(np.floor(min(a[1], b[1], c3[1]))))
        y1 = min(h - 1, int(np.ceil(max(a[1], b[1], c3[1]))))
        if x0 > x1 or y0 > y1:
            continue
        det = (b[0] - a[0]) * (c3[1] - a[1]) - (b[1] - a[1]) * (c3[0] - a[0])
        if abs(det) < 1e-12:
            continue
        ys, xs = np.mgrid[y0:y1 + 1, x0:x1 + 1]
        px, py = xs + 0.5, ys + 0.5
        w1 = ((px - a[0]) * (c3[1] - a[1]) - (py - a[1]) * (c3[0] - a[0])) / det
        w2 = ((b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])) / det
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = w0 * a[2] + w1 * b[2] + w2 * c3[2]
        closer = inside & (z < depth[y0:y1 + 1, x0:x1 + 1])
        sub = depth[y0:y1 + 1, x0:x1 + 1]
        sub[closer] = z[closer].astype(np.float32)
        face_id[y0:y1 + 1, x0:x1 + 1][closer] = f
        if colors is not None:
            ca, cb, cc = colors[tri[0]], colors[tri[1]], colors[tri[2]]
            col = (w0[..., None] * ca + w1[..., None] * cb + w2[..., None] * cc)
            rgb[y0:y1 + 1, x0:x1 + 1][closer] = col[closer].astype(np.float32)
    return rgb, depth, face_id
