"""Per-call definition-JSON trace dump.

Capability parity with reference flashinfer/fi_trace.py:16-30 (+ templates
flashinfer/trace/): when FLASHINFER_TPU_TRACE_DUMP=1, every decorated API
call writes a flashinfer-bench-style definition JSON describing the op and
its argument shapes/dtypes into FLASHINFER_TPU_TRACE_DIR.
"""

from __future__ import annotations

import json
import threading
from typing import Any

from .env import env

_counter = 0
_lock = threading.Lock()


def _arg_def(x: Any):
    shape = getattr(x, "shape", None)
    if shape is not None:
        return {"kind": "tensor", "shape": list(shape),
                "dtype": str(getattr(x, "dtype", "?"))}
    if isinstance(x, (int, float, bool, str)) or x is None:
        return {"kind": "scalar", "value": x}
    return {"kind": "opaque", "type": type(x).__name__}


def dump_trace(name: str, args: tuple, kwargs: dict) -> None:
    global _counter
    with _lock:
        idx = _counter
        _counter += 1
    definition = {
        "name": name,
        "index": idx,
        "args": [_arg_def(a) for a in args],
        "kwargs": {k: _arg_def(v) for k, v in kwargs.items()},
    }
    try:
        env.trace_dir.mkdir(parents=True, exist_ok=True)
        path = env.trace_dir / f"{idx:06d}_{name.replace('.', '_')}.json"
        path.write_text(json.dumps(definition, indent=1, default=str))
    except OSError:
        pass
