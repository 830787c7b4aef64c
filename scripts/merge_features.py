"""Merge per-mesh [600, D] view features into the [N, D] retrieval bank.

CLI counterpart of reference scripts/merge_features.py:17-35: mean over the
600 views per mesh, rows in filelist order.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

from scripts.common import load_filelist


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--features-dir", required=True)
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    names = load_filelist(args.filelist)
    rows = []
    missing = 0
    dim = None
    for name in names:
        path = Path(args.features_dir) / f"{name.replace('_', '')}.npy"
        if not path.exists():
            path = Path(args.features_dir) / f"{name}.npy"
        if path.exists():
            feats = np.load(path)
            dim = feats.shape[-1]
            rows.append(feats.mean(axis=0))
        else:
            rows.append(None)
            missing += 1
    if dim is None:
        raise SystemExit("no feature files found")
    bank = np.stack([r if r is not None else np.zeros(dim, np.float32) for r in rows])
    np.save(args.out, bank.astype(np.float32))
    print(f"bank {bank.shape} -> {args.out} ({missing} meshes missing, zero rows)")


if __name__ == "__main__":
    main()
