"""Full-suite runner that is green in ONE command (VERDICT r4 #6).

A single monolithic `pytest tests/` process accumulates XLA:CPU compiled
programs across ~350 tests and segfaults around the ~220th on a 1-core box
(compile-arena exhaustion in the CPU client — the tests themselves are
green). The reproducible recipe is: quick tier in one process, then the
heavy tier ONE MODULE PER FRESH PROCESS (each module's XLA state dies with
its interpreter). This script encodes it; `make test-all` runs it.

Exit code 0 iff every tier and module passed. Per-module timings and a
summary print at the end.
"""
from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _slow_modules() -> list[str]:
    """The slow-tier module list, read from tests/conftest.py (single source
    of truth — this script must not drift from the marker assignment)."""
    import re

    text = (REPO / "tests" / "conftest.py").read_text()
    block = re.search(r"_SLOW_MODULES\s*=\s*\{(.*?)\}", text, re.S).group(1)
    return sorted(re.findall(r'"(test_\w+)"', block))


def _run(args: list[str], timeout: int) -> tuple[int, float]:
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-m", "pytest", *args], cwd=REPO, timeout=timeout)
    return r.returncode, time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-quick", action="store_true")
    ap.add_argument("--module-timeout", type=int, default=2400)
    ap.add_argument("--modules", nargs="*", default=None,
                    help="subset of slow modules (default: all from conftest)")
    args = ap.parse_args()

    results: list[tuple[str, int, float]] = []
    if not args.skip_quick:
        rc, dt = _run(["tests/", "-m", "quick", "-q"], args.module_timeout)
        results.append(("quick tier", rc, dt))
    for mod in args.modules or _slow_modules():
        path = REPO / "tests" / f"{mod}.py"
        if not path.exists():
            print(f"!! {mod}: tests/{mod}.py missing (conftest list is stale)")
            results.append((mod, 2, 0.0))
            continue
        rc, dt = _run([f"tests/{mod}.py", "-q"], args.module_timeout)
        results.append((mod, rc, dt))

    print("\n=== test-all summary ===")
    failed = [name for name, rc, _ in results if rc != 0]
    for name, rc, dt in results:
        print(f"{'PASS' if rc == 0 else 'FAIL':4s}  {dt:7.1f}s  {name}")
    print(f"{len(results) - len(failed)}/{len(results)} green"
          + (f"; FAILED: {', '.join(failed)}" if failed else " — all green"))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
