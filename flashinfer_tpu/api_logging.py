"""API logging decorator.

Capability parity with reference flashinfer/api_logging.py
(`@flashinfer_api`, FLASHINFER_LOGLEVEL, FLASHINFER_LOGDEST with %i pid
substitution). Levels here (FLASHINFER_TPU_LOGLEVEL) mirror the
reference semantics (api_logging.py:2425-2432):

* 0  — off (zero overhead beyond one int compare)
* 1  — function name only, logged BEFORE execution (crash-safe)
* 2  — + input metadata (shape/dtype; kept from round 1)
* 3  — + input AND output metadata (reference level 3)
* 5  — + tensor statistics: min/max/mean/nan/inf counts (reference
       level 5; computed only on concrete arrays — tracers inside jit
       get metadata only, so decorated ops stay jit-safe)
* 10 — level 5 + dump input/output arrays to FLASHINFER_TPU_DUMP_DIR
       as .npz for reproduction (reference level-10 tensor dumping;
       inputs are written before execution so a crashing call still
       leaves its operands on disk)
"""

from __future__ import annotations

import functools
import os
import sys
import time
from typing import Any

from .env import env

_DUMP_WARNED = False
_dump_counter = 0


def _dest():
    d = env.logdest.replace("%i", str(os.getpid()))
    if d == "stdout":
        return sys.stdout
    if d == "stderr":
        return sys.stderr
    return open(d, "a")


def _is_concrete(x: Any) -> bool:
    """True for arrays whose values are readable now (not jit tracers)."""
    try:
        import jax

        if isinstance(x, jax.core.Tracer):
            return False
    except Exception:
        pass
    return hasattr(x, "shape") and hasattr(x, "dtype")


def _describe(x: Any, stats: bool) -> str:
    shape = getattr(x, "shape", None)
    dtype = getattr(x, "dtype", None)
    if shape is None:
        r = repr(x)
        return r if len(r) < 80 else r[:77] + "..."
    desc = f"array(shape={tuple(shape)}, dtype={dtype})"
    if stats and _is_concrete(x):
        try:
            import jax.numpy as jnp

            xf = x.astype(jnp.float32)
            desc += (
                f" min={float(xf.min()):.4g} max={float(xf.max()):.4g}"
                f" mean={float(xf.mean()):.4g}"
                f" nan={int(jnp.isnan(xf).sum())}"
                f" inf={int(jnp.isinf(xf).sum())}"
            )
        except Exception:
            pass
    return desc


def _flatten_out(res: Any):
    if isinstance(res, (tuple, list)):
        return list(res)
    return [res]


def _dump_arrays(tag: str, name: str, args: tuple, kwargs: dict) -> None:
    """Level-10: persist concrete array operands as one .npz per call."""
    global _DUMP_WARNED, _dump_counter
    import numpy as np

    if not _DUMP_WARNED:
        print(
            "WARNING: FLASHINFER_TPU_LOGLEVEL=10 dumps tensor CONTENTS to "
            f"{env.dump_dir} — may contain sensitive data.",
            file=sys.stderr,
        )
        _DUMP_WARNED = True
    arrays = {}
    for i, a in enumerate(args):
        if _is_concrete(a):
            try:
                arrays[f"arg{i}"] = np.asarray(a)
            except Exception:
                pass
    for k, v in kwargs.items():
        if _is_concrete(v):
            try:
                # output dicts arrive pre-named ("out0"); inputs get kw_.
                key = k if tag == "out" else f"kw_{k}"
                arrays[key] = np.asarray(v)
            except Exception:
                pass
    if not arrays:
        return
    try:
        env.dump_dir.mkdir(parents=True, exist_ok=True)
        idx = _dump_counter
        _dump_counter += 1
        path = env.dump_dir / (
            f"{idx:06d}_{name.replace('.', '_')}_{tag}.npz")
        np.savez(path, **arrays)
    except OSError:
        pass


def flashinfer_api(fn=None, *, trace: Any = None, method: bool = False):
    """Log API calls per FLASHINFER_TPU_LOGLEVEL (reference
    api_logging.py:2425-2530); also feeds the fi_trace dump when
    FLASHINFER_TPU_TRACE_DUMP is on and routes through trace_apply
    substitutions when enabled.

    ``trace``: optional :class:`flashinfer_tpu.trace.TraceTemplate`
    describing the op's schema — when trace dumping is on, the template
    writes a flashinfer-bench-style definition with named axes instead of
    the generic shape dump.
    """

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            lvl = env.loglevel
            log_args = args[1:] if method else args  # skip self
            out = None
            if lvl >= 1:
                out = _dest()
                ts = time.strftime("[%Y-%m-%d %H:%M:%S]")
                print(f"{ts} [flashinfer_tpu] {f.__qualname__}", file=out)
                if lvl >= 2:
                    stats = lvl >= 5
                    for i, a in enumerate(log_args):
                        print(f"  arg[{i}] = {_describe(a, stats)}",
                              file=out)
                    for k, v in kwargs.items():
                        print(f"  {k} = {_describe(v, stats)}", file=out)
                out.flush()
            if lvl >= 10:
                _dump_arrays("in", f.__qualname__, log_args, kwargs)
            if env.trace_dump:
                if trace is not None:
                    trace.dump(f.__qualname__, log_args, kwargs)
                else:
                    from .fi_trace import dump_trace

                    dump_trace(f.__qualname__, log_args, kwargs)
            from . import trace_apply

            if trace_apply.is_enabled():
                res = trace_apply.dispatch(f.__qualname__, f, args, kwargs)
            else:
                res = f(*args, **kwargs)
            if lvl >= 3 and out is not None:
                stats = lvl >= 5
                for i, r in enumerate(_flatten_out(res)):
                    print(f"  out[{i}] = {_describe(r, stats)}", file=out)
                out.flush()
            if lvl >= 10:
                outs = {f"out{i}": r
                        for i, r in enumerate(_flatten_out(res))}
                _dump_arrays("out", f.__qualname__, (), outs)
            return res

        wrapper.__flashinfer_trace__ = trace
        return wrapper

    if fn is not None:
        return deco(fn)
    return deco
