"""Runtime kernel substitution from trace definitions.

Capability parity with reference flashinfer/trace_apply/ (zero-code kernel
substitution: FLASHINFER_TRACE_APPLY=1 loads a {definition_name: solution}
mapping and reroutes decorated API calls to user-provided kernels, with
per-(api, status) dispatch stats). Here solutions are Python callables
(e.g. alternative Pallas kernels) keyed by the @flashinfer_api qualname.
"""

from __future__ import annotations

import threading
from collections import Counter
from typing import Any, Callable

_lock = threading.Lock()
_solutions: dict[str, Callable] = {}
_enabled = False
_stats: Counter = Counter()


def enable_apply(solutions: dict[str, Callable]) -> None:
    """Install substitutions (reference trace_apply enable_apply)."""
    global _enabled
    with _lock:
        _solutions.update(solutions)
        _enabled = True


def disable_apply() -> None:
    global _enabled
    with _lock:
        _enabled = False
        _solutions.clear()
        _stats.clear()


def is_enabled() -> bool:
    return _enabled


def stats() -> dict:
    """Per-(api, status) dispatch counts: hit / fallback_no_candidate /
    error (reference trace_apply stats contract)."""
    with _lock:
        return dict(_stats)


stats_snapshot = stats


def dispatch(name: str, default_fn: Callable, args: tuple, kwargs: dict
             ) -> Any:
    """Route one API call through an installed solution if present.

    Called by the @flashinfer_api decorator when apply-mode is enabled.
    A solution that raises is counted as `error` and re-raised (strict
    mode, matching the reference).
    """
    if not _enabled:
        return default_fn(*args, **kwargs)
    sol = _solutions.get(name)
    if sol is None:
        _stats[(name, "fallback_no_candidate")] += 1
        return default_fn(*args, **kwargs)
    try:
        out = sol(*args, **kwargs)
    except Exception:
        _stats[(name, "error")] += 1
        raise
    _stats[(name, "hit")] += 1
    return out
