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
