"""Fetch Objaverse/GSO meshes listed in a filelist (reference
scripts/download_objaverse.py). This build environment has no network egress;
the script validates its inputs and reports what it WOULD fetch, and performs
real downloads when the objaverse SDK/network is available."""
from __future__ import annotations

import argparse
from pathlib import Path

from scripts.common import load_filelist


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--filelist", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    names = load_filelist(args.filelist)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    try:
        import objaverse  # type: ignore
    except ImportError:
        present = sum((out / n / f"{n}.obj").exists() for n in names)
        print(f"objaverse SDK unavailable (offline build); {present}/{len(names)} meshes already present in {out}")
        return
    objaverse.load_objects(uids=names, download_processes=8)


if __name__ == "__main__":
    main()
