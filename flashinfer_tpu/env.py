"""Environment flag system for flashinfer-tpu.

Mirrors the reference's env-variable config surface (FLASHINFER_* flags,
reference: flashinfer/jit/env.py, flashinfer/api_logging.py) with
TPU-native equivalents. All flags are read once at import and may be
refreshed with :func:`refresh`.
"""

from __future__ import annotations

import os
from pathlib import Path


def _env_bool(name: str, default: bool = False) -> bool:
    val = os.environ.get(name)
    if val is None:
        return default
    return val.strip().lower() not in ("0", "false", "no", "off", "")


def _env_int(name: str, default: int) -> int:
    val = os.environ.get(name)
    if val is None:
        return default
    try:
        return int(val)
    except ValueError:
        return default


class _Env:
    """Lazily refreshable env-flag namespace."""

    def __init__(self) -> None:
        self.refresh()

    def refresh(self) -> None:
        # Logging: 0 = off, 1 = api names, 2 = + args, 3 = + tensor stats.
        self.loglevel: int = _env_int("FLASHINFER_TPU_LOGLEVEL", 0)
        self.logdest: str = os.environ.get("FLASHINFER_TPU_LOGDEST", "stdout")
        # Force Pallas interpreter mode (CPU debugging / CI without TPUs).
        self.interpret: bool = _env_bool("FLASHINFER_TPU_INTERPRET", False)
        # Cache dir for autotuner results and compilation cache.
        self.cache_dir: Path = Path(
            os.environ.get(
                "FLASHINFER_TPU_CACHE_DIR",
                os.path.join(
                    os.environ.get("HOME", "/tmp"), ".cache", "flashinfer_tpu"
                ),
            )
        )
        # Disable the native (C++) planner; use the pure-python fallback.
        self.disable_native: bool = _env_bool("FLASHINFER_TPU_DISABLE_NATIVE", False)
        # In-kernel event tags (reference profiler.cuh PROFILER_EVENT_START
        # ring buffer): emit pltpu.trace_value scalars from kernel hot
        # loops into the xprof device trace. Compiled Mosaic only.
        self.kernel_events: bool = _env_bool(
            "FLASHINFER_TPU_KERNEL_EVENTS", False)
        # Trace dump (reference: FLASHINFER_TRACE_DUMP, fi_trace.py).
        self.trace_dump: bool = _env_bool("FLASHINFER_TPU_TRACE_DUMP", False)
        self.trace_dir: Path = Path(
            os.environ.get("FLASHINFER_TPU_TRACE_DIR", "/tmp/flashinfer_tpu_trace")
        )
        # Level-10 tensor dump dir (reference FLASHINFER_DUMP_DIR).
        self.dump_dir: Path = Path(
            os.environ.get("FLASHINFER_TPU_DUMP_DIR",
                           "/tmp/flashinfer_tpu_dumps")
        )


env = _Env()


def is_tpu_backend() -> bool:
    """True when the default JAX backend is a real TPU."""
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def resolve_interpret(interpret: bool | None) -> bool:
    """Resolve the Pallas ``interpret`` flag.

    ``None`` means auto: interpret on non-TPU backends so the whole kernel
    suite runs (and is tested) on CPU, compiled on real TPU.
    """
    if interpret is not None:
        return interpret
    if env.interpret:
        return True
    return not is_tpu_backend()
