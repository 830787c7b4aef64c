"""Metric scale estimation: constant, depth-mean, and CLIP + LLM-prior kNN.

TPU-native counterparts of the reference's three scale estimators
(src/pipeline/estimators/scale_estimators.py:12-80):

  * ConstantScaleEstimator — a fixed half-extent;
  * MeanScaleEstimator — per-mask depth pointcloud extents, corrected so
    their mean matches a prior mean scale;
  * ClipPriorScaleEstimator ("GPT4ScaleEstimator") — CLIP-embed each
    proposal, kNN (k=11, median) against the text embeddings of 2,201
    LLM-prior object->size entries, optionally corrected by observed depth.

The KDTree of the reference becomes a brute-force cosine top-k on device
(freepose_tpu.ops.knn — exact, MXU-shaped). Pointcloud math uses masked
static-shape reductions (freepose_tpu.geometry.pointcloud).
"""
from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from freepose_tpu.geometry.pointcloud import (
    bbox_half_extent,
    pointcloud_from_mask,
)
from freepose_tpu.ops.connected_components import largest_component
from freepose_tpu.ops.erosion import adaptive_erosion
from freepose_tpu.ops.knn import knn_median_lookup


def depth_scales(
    depth: jax.Array, k: jax.Array, masks: jax.Array, svd: bool = True,
    erosion_radius: int = 8, min_vertices: int = 25,
) -> jax.Array:
    """Per-mask pointcloud half-extent estimates [N]
    (reference generate_pointcloud + get_scale, scale_estimators.py:117-177).
    """

    def one(mask):
        m = largest_component(mask)
        m = adaptive_erosion(m, erosion_radius, min_pixels=min_vertices)
        pts, valid = pointcloud_from_mask(depth, k, m, min_vertices=min_vertices, svd=svd)
        return bbox_half_extent(pts, valid)

    return jax.lax.map(one, masks)


class ConstantScaleEstimator:
    def __init__(self, const: float):
        self.const = float(const)

    def estimate(self, proposals, depth=None, k=None) -> np.ndarray:
        n = len(proposals) if hasattr(proposals, "__len__") else 1
        return np.full(n, self.const, np.float32)


class MeanScaleEstimator:
    """Depth-derived scales, mean-corrected to a prior (reference
    scale_estimators.py:20-32)."""

    def __init__(self, mean_scale: float, svd: bool = True):
        self.mean_scale = mean_scale
        self.svd = svd

    def estimate(self, proposals, depth, k) -> np.ndarray:
        scales = np.asarray(depth_scales(jnp.asarray(depth), jnp.asarray(k), proposals.full_masks, self.svd))
        correction = self.mean_scale / (2.0 * scales.mean())
        return scales * correction


class ClipPriorScaleEstimator:
    """CLIP-kNN over LLM text-prior scales (reference GPT4ScaleEstimator,
    scale_estimators.py:35-102).

    `clip` is a ClipFeatureExtractor; `tokenize` maps list[str] -> int32 ids
    [N, L]. Text features for the prior table are built once and cached.
    """

    def __init__(
        self,
        clip,
        tokenize,
        scale_file: str | Path | None = None,
        feats_path: str | Path | None = None,
        query_k: int = 11,
        svd: bool = True,
    ):
        self.clip = clip
        self.query_k = query_k
        self.svd = svd
        if feats_path and Path(feats_path).exists():
            z = np.load(feats_path)
            text_features, scales = z["feats"], z["scales"]
        else:
            text_features, scales = self.build_text_features(scale_file, clip, tokenize)
            if feats_path:
                np.savez(feats_path, feats=text_features, scales=scales)
        self.text_features = jnp.asarray(text_features)
        self.scales = jnp.asarray(scales)

    @staticmethod
    def build_text_features(scale_file, clip, tokenize, batch: int = 256):
        with open(scale_file) as f:
            prior = json.load(f)
        names = list(prior.keys())
        scales = np.asarray([prior[n] for n in names], np.float32)
        feats = []
        for i in range(0, len(names), batch):
            ids = jnp.asarray(tokenize(names[i : i + batch]))
            f = clip.encode_text(ids)
            f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
            feats.append(np.asarray(f, np.float32))
        return np.concatenate(feats), scales

    def estimate(self, proposals, depth=None, k=None) -> np.ndarray:
        use_depth = depth is not None and len(proposals) > 1
        img = proposals.proposals  # [N, 3, T, T]
        feats = self.clip.encode_image(img)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        k_eff = min(self.query_k, len(self.scales))  # tiny priors: clamp k
        prior_scales = knn_median_lookup(self.text_features, self.scales, feats, k_eff)
        prior_scales = np.asarray(prior_scales)
        if use_depth:
            d_scales = np.asarray(
                depth_scales(jnp.asarray(depth), jnp.asarray(k), proposals.full_masks, self.svd)
            )
            correction = np.median(prior_scales / np.maximum(d_scales, 1e-9))
            scales = d_scales * correction
        else:
            scales = prior_scales
        return scales / 2.0
