"""Autotuner: profile-based tactic selection with a persistent JSON cache.

Capability parity with reference flashinfer/autotuner/
(`autotune()` ctx manager autotuner.py:624, `TunableRunner.get_valid_tactics`
autotuner.py:540-562, profile-based `choose_one` autotuner.py:1399, shape
bucketing `make_bucket_mapper` autotuner.py:141, persistent JSON cache with
env-metadata invalidation autotuner.py:297-382,1012).

TPU re-design: tactics are Pallas kernel parameters (block sizes, grid
layouts) or algorithm variants; profiling uses the dependent-chain loop
timer (testing/utils.bench_loop) so remote-tunnel dispatch latency cancels.
Outside `autotune()`, cached tactics are looked up (fallback tactic 0) —
same contract as the reference.
"""

from __future__ import annotations

import contextlib
import json
import math
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import jax

from .env import env


def _env_metadata() -> dict:
    dev = jax.devices()[0]
    return {
        "device_kind": getattr(dev, "device_kind", "unknown"),
        "platform": dev.platform,
        "jax": jax.__version__,
    }


def make_bucket_mapper(buckets: Sequence[int]) -> Callable[[int], int]:
    """Map a dynamic dim to its bucket (reference autotuner.py:141):
    smallest bucket >= x, else the largest."""
    bs = sorted(buckets)

    def mapper(x: int) -> int:
        for b in bs:
            if x <= b:
                return b
        return bs[-1]

    return mapper


class TunableRunner:
    """One algorithm implementation with enumerable tactics
    (reference autotuner.py:540)."""

    def get_valid_tactics(self, inputs: Sequence[Any], profile: Any = None
                          ) -> list[Any]:
        return [0]

    def forward(self, inputs: Sequence[Any], tactic: Any = -1) -> Any:
        raise NotImplementedError


@dataclass
class AutoTuner:
    """Singleton tactic chooser (reference AutoTuner autotuner.py:624ff)."""

    cache: dict[str, Any] = field(default_factory=dict)
    is_tuning: bool = False
    repeat: int = 5
    _lock: threading.Lock = field(default_factory=threading.Lock)
    _loaded: bool = False

    _instance = None

    @classmethod
    def get(cls) -> "AutoTuner":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    # -- persistence ---------------------------------------------------------
    @property
    def cache_path(self):
        return env.cache_dir / "autotuner_cache.json"

    def load_from_file(self) -> None:
        """Load cached tactics; discard on env-metadata mismatch
        (reference autotuner.py:1012 + _collect_metadata :297)."""
        self._loaded = True
        try:
            data = json.loads(self.cache_path.read_text())
        except (OSError, ValueError):
            return
        if data.get("metadata") != _env_metadata():
            return
        self.cache.update(data.get("tactics", {}))

    def save_to_file(self) -> None:
        try:
            self.cache_path.parent.mkdir(parents=True, exist_ok=True)
            self.cache_path.write_text(json.dumps({
                "metadata": _env_metadata(),
                "tactics": self.cache,
            }, indent=1, default=str))
        except OSError:
            pass

    # -- the core ------------------------------------------------------------
    def choose_one(
        self,
        name: str,
        runners: Sequence[TunableRunner],
        inputs: Sequence[Any],
        cache_key_extra: str = "",
    ) -> tuple[TunableRunner, Any]:
        """Pick (runner, tactic) for this op+shapes
        (reference autotuner.py:1399). Profiles only inside autotune();
        otherwise returns the cached choice or (runners[0], tactic 0/-1).
        """
        if not self._loaded:
            self.load_from_file()
        shapes = tuple(
            tuple(getattr(x, "shape", ())) for x in inputs
        )
        key = f"{name}|{shapes}|{cache_key_extra}"
        with self._lock:
            hit = self.cache.get(key)
        if hit is not None:
            r_idx, tactic = hit
            return runners[int(r_idx)], tactic
        if not self.is_tuning:
            tactics = runners[0].get_valid_tactics(inputs)
            return runners[0], (tactics[0] if tactics else -1)

        best = (math.inf, 0, -1)
        for ri, runner in enumerate(runners):
            for tactic in runner.get_valid_tactics(inputs):
                try:
                    t = self._profile(runner, inputs, tactic)
                except Exception:
                    continue
                if t < best[0]:
                    best = (t, ri, tactic)
        _, ri, tactic = best
        with self._lock:
            self.cache[key] = [ri, tactic]
        self.save_to_file()
        return runners[ri], tactic

    def _profile(self, runner: TunableRunner, inputs, tactic) -> float:
        import time

        import numpy as np

        if hasattr(runner, "bench"):
            # in-jit dependent-chain timing: wall-clock per-call profiling
            # is useless over the axon tunnel (25-90 ms RTT vs ~ms kernels)
            return float(runner.bench(inputs, tactic))
        out = runner.forward(inputs, tactic=tactic)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.numpy.ravel(leaf)[0])
        t0 = time.perf_counter()
        for _ in range(self.repeat):
            out = runner.forward(inputs, tactic=tactic)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(jax.numpy.ravel(leaf)[0])
        return (time.perf_counter() - t0) / self.repeat


@contextlib.contextmanager
def autotune(tune_mode: bool = True, cache_path: Any = None):
    """Enable tuning within the context (reference autotuner.py:624)."""
    tuner = AutoTuner.get()
    prev = tuner.is_tuning
    tuner.is_tuning = tune_mode
    try:
        yield tuner
    finally:
        tuner.is_tuning = prev
        if tune_mode:
            tuner.save_to_file()
