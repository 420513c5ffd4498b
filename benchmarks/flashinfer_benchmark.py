"""Unified benchmark harness (reference benchmarks/flashinfer_benchmark.py
+ benchmarks/routines/): a routine registry with per-family configs,
roofline reporting, and JSON output.

Usage:
    python benchmarks/flashinfer_benchmark.py --routine decode_attention
    python benchmarks/flashinfer_benchmark.py --list
    python benchmarks/flashinfer_benchmark.py --all
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from routines import REGISTRY  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--routine", action="append", default=[])
    p.add_argument("--list", action="store_true")
    p.add_argument("--all", action="store_true")
    p.add_argument("--json", action="store_true", help="one JSON line each")
    args = p.parse_args(argv)

    if args.list:
        for name, fn in sorted(REGISTRY.items()):
            print(f"{name:28s} {fn.__doc__.splitlines()[0] if fn.__doc__ else ''}")
        return 0

    names = list(REGISTRY) if args.all else args.routine
    if not names:
        p.error("pass --routine NAME (repeatable), --all, or --list")
    for name in names:
        result = REGISTRY[name]()
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
