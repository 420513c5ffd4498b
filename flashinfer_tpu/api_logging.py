"""API logging decorator.

Capability parity with reference flashinfer/api_logging.py
(`@flashinfer_api`, FLASHINFER_LOGLEVEL 0-5: name → args → tensor stats,
FLASHINFER_LOGDEST with %i pid substitution). Levels here
(FLASHINFER_TPU_LOGLEVEL): 0 off, 1 names, 2 + args, 3 + array stats.
"""

from __future__ import annotations

import functools
import os
import sys
from typing import Any

from .env import env


def _dest():
    d = env.logdest.replace("%i", str(os.getpid()))
    if d == "stdout":
        return sys.stdout
    if d == "stderr":
        return sys.stderr
    return open(d, "a")


def _describe(x: Any, stats: bool) -> str:
    shape = getattr(x, "shape", None)
    dtype = getattr(x, "dtype", None)
    if shape is None:
        r = repr(x)
        return r if len(r) < 80 else r[:77] + "..."
    desc = f"array(shape={tuple(shape)}, dtype={dtype})"
    if stats:
        try:
            import jax.numpy as jnp

            xf = x.astype(jnp.float32)
            desc += (f" mean={float(xf.mean()):.4g}"
                     f" absmax={float(jnp.abs(xf).max()):.4g}")
        except Exception:
            pass
    return desc


def flashinfer_api(fn=None, *, trace: Any = None):
    """Log API calls per FLASHINFER_TPU_LOGLEVEL (reference
    api_logging.py:125-224); also feeds the fi_trace dump when
    FLASHINFER_TPU_TRACE_DUMP is on."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            lvl = env.loglevel
            if lvl >= 1:
                out = _dest()
                print(f"[flashinfer_tpu] {f.__qualname__}", file=out)
                if lvl >= 2:
                    stats = lvl >= 3
                    for i, a in enumerate(args):
                        print(f"  arg[{i}] = {_describe(a, stats)}", file=out)
                    for k, v in kwargs.items():
                        print(f"  {k} = {_describe(v, stats)}", file=out)
                out.flush()
            if env.trace_dump:
                from .fi_trace import dump_trace

                dump_trace(f.__qualname__, args, kwargs)
            from . import trace_apply

            if trace_apply.is_enabled():
                return trace_apply.dispatch(f.__qualname__, f, args, kwargs)
            return f(*args, **kwargs)

        return wrapper

    if fn is not None:
        return deco(fn)
    return deco
