"""Persistent benchmark worker: runs metrics by name from stdin.

The axon tunnel charges minutes of connection/session setup per PROCESS
on bad draws (measured 4 s on a good draw, 357 s on a slow one, wedged
entirely at times). A subprocess-per-metric harness would pay that per
metric; this worker pays it ONCE, while the orchestrator (bench.py)
still enforces per-metric wall deadlines by killing this process (exact
PID) and restarting it only after a hang.

Protocol: one metric name per stdin line -> one JSON result line +
a "<<DONE>>" sentinel line on stdout. "EXIT" terminates.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    import os

    sys.path.insert(0, ".")
    plat = os.environ.get("FLASHINFER_TPU_BENCH_PLATFORM")
    if plat:
        # CI smoke: force a backend (the axon sitecustomize overrides the
        # JAX_PLATFORMS env var, so this must be a config update)
        import jax
        jax.config.update("jax_platforms", plat)
    reg = None
    for line in sys.stdin:
        name = line.strip()
        if not name:
            continue
        if name == "EXIT":
            break
        if reg is None:
            from benchmarks.runner import _registry
            reg = _registry()
        try:
            r = reg[name]()
            r["metric"] = name
        except Exception as e:  # noqa: BLE001 - report, never die
            r = {"metric": name, "error": str(e)[:300]}
        print(json.dumps(r), flush=True)
        print("<<DONE>>", flush=True)


if __name__ == "__main__":
    main()
