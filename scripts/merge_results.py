"""Concatenate per-shard result CSVs (reference scripts/merge_results.py)."""
from __future__ import annotations

import argparse
from pathlib import Path

from freepose_tpu.io.bop_csv import merge_result_csvs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", required=True)
    ap.add_argument("--pattern", default="*.csv")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    paths = sorted(Path(args.results_dir).glob(args.pattern))
    if not paths:
        raise SystemExit(f"no CSVs matching {args.pattern} in {args.results_dir}")
    merge_result_csvs(paths, args.out)
    print(f"merged {len(paths)} CSVs -> {args.out}")


if __name__ == "__main__":
    main()
