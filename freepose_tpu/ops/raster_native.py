"""ctypes binding to the native C++ host rasterizer.

Eval-side renderer twin of the device rasterizer (ops/rasterizer.py),
mirroring the reference's external C++ bop_renderer
(bop_toolkit/bop_toolkit_lib/renderer_cpp.py:12-66): BOP-style evaluation
(vsd visibility masks, cus silhouettes) on hosts with no accelerator, and
the parity oracle for the device path. Same conventions bit-for-bit where
fp allows: OpenCV camera, +0.5 pixel centers, no culling, 1e-5*|area| seam
tolerance, perspective-correct 1/z, first-face-wins depth ties.

Builds lazily with `make -C csrc` on first use.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libfreepose_raster.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_CSRC)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = ctypes.POINTER(ctypes.c_float)
    i32 = ctypes.c_int32
    lib.rasterize_mesh_batch.argtypes = [
        f32p, i32,  # vertices
        ctypes.POINTER(ctypes.c_int32), i32,  # faces
        f32p, i32,  # poses
        f32p,  # intrinsics
        f32p,  # colors (nullable)
        i32, i32,  # height, width
        ctypes.c_float, ctypes.c_float,  # znear, ambient
        f32p, f32p,  # out depth, out rgb (nullable)
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def rasterize_native(
    vertices: np.ndarray,  # [V, 3] float32 object-space
    faces: np.ndarray,  # [F, 3] int32
    poses: np.ndarray,  # [P, 4, 4] camera-from-object
    k: np.ndarray,  # [3, 3]
    colors: np.ndarray | None = None,  # [V, 3] in [0,1]
    height: int = 420,
    width: int | None = None,
    znear: float = 1e-4,
    ambient: float = 2.0,
) -> tuple[np.ndarray | None, np.ndarray]:
    """-> (rgb [P, H, W, 3] or None when colors is None, depth [P, H, W])."""
    lib = _load()
    width = width if width is not None else height
    v = np.ascontiguousarray(vertices, np.float32)
    f = np.ascontiguousarray(faces, np.int32)
    p = np.ascontiguousarray(poses, np.float32).reshape(-1, 4, 4)
    kk = np.ascontiguousarray(k, np.float32)
    n_poses = p.shape[0]
    depth = np.empty((n_poses, height, width), np.float32)
    if colors is not None:
        c = np.ascontiguousarray(colors, np.float32)
        rgb = np.empty((n_poses, height, width, 3), np.float32)
        rgb_ptr = rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        col_ptr = c.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    else:
        rgb = None
        rgb_ptr = ctypes.POINTER(ctypes.c_float)()
        col_ptr = ctypes.POINTER(ctypes.c_float)()
    lib.rasterize_mesh_batch(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), v.shape[0],
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), f.shape[0],
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_poses,
        kk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        col_ptr, height, width,
        ctypes.c_float(znear), ctypes.c_float(ambient),
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), rgb_ptr,
    )
    return rgb, depth
