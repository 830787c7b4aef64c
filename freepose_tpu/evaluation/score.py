"""Pose matching and recall scoring (BOP19 protocol).

Equivalents of bop_toolkit's matching + scoring
(bop_toolkit_lib/pose_matching.py:9-161, score.py:12-169) and the custom
eval driver's error/threshold sweep (bop_toolkit/scripts/eval_bop19_pose.py:
19-70): errors {cus, chamfer, chamfer_proj} with correctness thresholds,
average recall = mean over thresholds of matched-GT recall.
"""
from __future__ import annotations

import dataclasses

import numpy as np

# BOP19-style threshold sweeps for the repo's custom error set
# (reference eval_bop19_pose.py:19-70).
DEFAULT_ERROR_THRESHOLDS = {
    "cus": np.arange(0.05, 0.51, 0.05),
    "chamfer": np.arange(0.05, 0.51, 0.05),  # relative to object diameter
    "chamfer_proj": np.arange(5, 51, 5),  # pixels
    "mspd": np.arange(5, 51, 5),
    "mssd": np.arange(0.05, 0.51, 0.05),
}


@dataclasses.dataclass
class EstimateErrors:
    """Errors of one estimate against every GT instance of a frame."""

    scene_id: int
    im_id: int
    obj_id: object
    score: float
    errors: dict  # gt_index -> float


def match_poses(
    frame_errors: list[EstimateErrors],
    threshold: float,
    n_gts: int,
    n_top: int = -1,
) -> tuple[list[tuple[int, int]], int]:
    """Greedy matching of estimates to GT instances at one error threshold
    (reference pose_matching.py): estimates sorted by confidence, each takes
    its lowest-error unclaimed GT if the error passes the threshold.

    Returns (matches [(est_idx, gt_idx)], n_gts).
    """
    order = np.argsort([-e.score for e in frame_errors])
    if n_top > 0:
        order = order[:n_top]
    claimed = set()
    matches = []
    for est_idx in order:
        errs = frame_errors[est_idx].errors
        best_gt, best_err = None, np.inf
        for gt_idx, err in errs.items():
            if gt_idx in claimed or err > threshold:
                continue
            if err < best_err:
                best_gt, best_err = gt_idx, err
        if best_gt is not None:
            claimed.add(best_gt)
            matches.append((int(est_idx), int(best_gt)))
    return matches, n_gts


def recall_at_threshold(
    per_frame: list[tuple[list[EstimateErrors], int]], threshold: float
) -> float:
    """Recall over all frames: matched GTs / total GTs."""
    matched = 0
    total = 0
    for frame_errors, n_gts in per_frame:
        m, _ = match_poses(frame_errors, threshold, n_gts)
        matched += len(m)
        total += n_gts
    return matched / total if total else 0.0


def average_recall(
    per_frame: list[tuple[list[EstimateErrors], int]], thresholds: np.ndarray
) -> float:
    return float(np.mean([recall_at_threshold(per_frame, t) for t in thresholds]))


def bop19_average_recalls(
    errors_by_type: dict, thresholds: dict | None = None
) -> dict:
    """errors_by_type: {"cus": per_frame, "chamfer": per_frame, ...} ->
    per-error AR plus the overall mean AR (the headline metric)."""
    thresholds = thresholds or DEFAULT_ERROR_THRESHOLDS
    out = {}
    for err_type, per_frame in errors_by_type.items():
        out[f"AR_{err_type}"] = average_recall(per_frame, np.asarray(thresholds[err_type]))
    out["AR"] = float(np.mean([v for k, v in out.items() if k.startswith("AR_")]))
    return out
