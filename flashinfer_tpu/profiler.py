"""Profiling: span collection + Perfetto/chrome-trace export + XLA traces.

Capability parity with reference intra-kernel profiler
(include/flashinfer/profiler.cuh:149 event-tag ring buffer →
flashinfer/profiler/__init__.py export_to_perfetto_trace): on TPU,
intra-kernel timelines come from the XLA/TPU profiler
(`jax.profiler.trace`, viewable in Perfetto/TensorBoard), and host-side
op spans are collected by :class:`ProfilerContext` and exported as
chrome-trace JSON (Perfetto-compatible).

In-kernel event tags: set ``FLASHINFER_TPU_KERNEL_EVENTS=1`` and the
streaming decode/prefill kernels emit ``pltpu.trace_value`` scalars
(``fi.decode.kv_len``, ``fi.decode.valid_chunks``, ``fi.prefill.kv_len``,
``fi.prefill.n_chunks``) from inside the kernel hot path. They attach to
the kernel's trace event in the xprof capture taken under
:func:`device_trace` — the TPU analog of the reference's per-block event
ring buffer (compiled Mosaic only; ignored under the interpreter).
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from dataclasses import dataclass, field
from typing import Any


@dataclass
class _Span:
    name: str
    ts_us: float
    dur_us: float
    args: dict


@dataclass
class ProfilerContext:
    """Host-side span recorder (the reference's event ring-buffer analog)."""

    spans: list = field(default_factory=list)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    @contextlib.contextmanager
    def event(self, name: str, **args):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dur = (time.perf_counter() - t0) * 1e6
            with self._lock:
                self.spans.append(_Span(name, t0 * 1e6, dur, args))

    def export_to_perfetto_trace(self, path: str) -> None:
        """Write chrome-trace JSON loadable in ui.perfetto.dev (reference
        profiler/__init__.py export_to_perfetto_trace)."""
        events = [
            {
                "name": s.name, "ph": "X", "ts": s.ts_us, "dur": s.dur_us,
                "pid": 0, "tid": 0, "args": s.args,
            }
            for s in self.spans
        ]
        with open(path, "w") as f:
            json.dump({"traceEvents": events}, f)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an XLA/TPU device trace (kernel-level timeline) viewable in
    TensorBoard/Perfetto — the TPU-native equivalent of the reference's
    device event profiler."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def decode_tag(tag: int) -> dict:
    """Decode a reference-format 32-bit profiler event tag
    (sm_id | block | event | type — profiler.cuh:149); kept for trace
    tooling compatibility."""
    return {
        "type": tag & 0x3,
        "event": (tag >> 2) & 0x3FFF,
        "block": (tag >> 16) & 0xFF,
        "core": (tag >> 24) & 0xFF,
    }
