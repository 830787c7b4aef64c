"""ctypes binding to the native C++ connected-components library.

Host-side fast path for mask postprocessing (IO workers / eval cleanup that
never touch the device) and the parity oracle for the TPU label-propagation
kernel (freepose_tpu/ops/connected_components.py). Builds lazily with `make`
on first use; callers can fall back to the device kernel when no compiler is
available.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_LIB_PATH = _CSRC / "libfreepose_cc.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(["make", "-C", str(_CSRC)], check=True, capture_output=True)
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.connected_components_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.remove_small_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def connected_components_batch(masks: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[N, H, W] bool/uint8 -> (labels int32 [N,H,W] min-index/-1,
    areas int32 [N,H,W]) — same contract as the device kernel."""
    lib = _load()
    m = np.ascontiguousarray(masks.astype(np.uint8))
    n, h, w = m.shape
    labels = np.empty((n, h, w), np.int32)
    areas = np.empty((n, h, w), np.int32)
    lib.connected_components_batch(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        areas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return labels, areas


def remove_small_components(masks: np.ndarray, max_area: int, fill_holes: bool = True) -> np.ndarray:
    lib = _load()
    m = np.ascontiguousarray(masks.astype(np.uint8)).copy()
    n, h, w = m.shape
    lib.remove_small_components(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w, max_area, int(fill_holes)
    )
    return m.astype(bool)


def largest_component(mask: np.ndarray) -> np.ndarray:
    labels, areas = connected_components_batch(mask[None])
    labels, areas = labels[0], areas[0]
    if areas.max() == 0:
        return np.zeros_like(mask, bool)
    best_area = areas.max()
    candidates = labels[(areas == best_area) & (labels >= 0)]
    return labels == candidates.min()
