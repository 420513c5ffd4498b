"""Shared utilities: KV layouts, shape rounding, backend dispatch, dtypes.

Capability parity with reference flashinfer/utils.py (kv-layout handling
utils.py:186, `backend_requirement` decorator utils.py:1164,
`supported_compute_capability` utils.py:1081) re-designed for TPU:
backend gating is over TPU generation / JAX backend instead of SM arch.
"""

from __future__ import annotations

import enum
import functools
import math
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class KVLayout(enum.Enum):
    """Paged / ragged KV layout (reference: include/flashinfer/layout.cuh).

    NHD: [..., page_size (or seq), num_kv_heads, head_dim]
    HND: [..., num_kv_heads, page_size (or seq), head_dim]
    """

    NHD = "NHD"
    HND = "HND"


def check_kv_layout(layout: str | KVLayout) -> KVLayout:
    if isinstance(layout, KVLayout):
        return layout
    try:
        return KVLayout(layout)
    except ValueError:
        raise ValueError(f"Invalid kv_layout {layout!r}; expected 'NHD' or 'HND'")


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def next_power_of_2(x: int) -> int:
    return 1 if x <= 1 else 2 ** math.ceil(math.log2(x))


# Default shape buckets used by plan() to keep XLA shapes static across
# steps (the TPU analog of the reference's CUDA-graph fixed-shape contract,
# flashinfer/decode.py:1437-1466). Buckets are powers of two.
def bucket_size(x: int, minimum: int = 1) -> int:
    return max(minimum, next_power_of_2(x))


def unpack_paged_kv_cache(
    paged_kv_cache: Any, kv_layout: str | KVLayout
) -> tuple[jax.Array, jax.Array]:
    """Unpack a paged KV-cache into (k_cache, v_cache).

    Accepts either a tuple/list ``(k_cache, v_cache)`` of 4-D arrays or a
    single 5-D array ``[max_num_pages, 2, ...]`` — the same contract as the
    reference (flashinfer/utils.py:186, decode.py:1841-1852).
    """
    if isinstance(paged_kv_cache, (tuple, list)):
        k_cache, v_cache = paged_kv_cache
        if k_cache.ndim != 4:
            raise ValueError(
                f"k_cache must be 4-D [pages, ...], got shape {k_cache.shape}"
            )
        return k_cache, v_cache
    if paged_kv_cache.ndim != 5 or paged_kv_cache.shape[1] != 2:
        raise ValueError(
            "paged_kv_cache must be (k, v) tuple of 4-D arrays or 5-D "
            f"[max_num_pages, 2, ...]; got shape {paged_kv_cache.shape}"
        )
    return paged_kv_cache[:, 0], paged_kv_cache[:, 1]


def kv_cache_dims(
    k_cache: jax.Array, kv_layout: KVLayout
) -> tuple[int, int, int, int]:
    """Return (num_pages, page_size, num_kv_heads, head_dim)."""
    if kv_layout == KVLayout.NHD:
        p, ps, h, d = k_cache.shape
    else:
        p, h, ps, d = k_cache.shape
    return p, ps, h, d


class PosEncodingMode(enum.Enum):
    """Positional-encoding fused into attention (reference pos_enc.cuh)."""

    NONE = "NONE"
    ROPE_LLAMA = "ROPE_LLAMA"
    ALIBI = "ALIBI"


class MaskMode(enum.Enum):
    NON_CAUSAL = 0
    CAUSAL = 1
    CUSTOM = 2


# ---------------------------------------------------------------------------
# Backend dispatch (TPU generation gating)
# ---------------------------------------------------------------------------


def get_tpu_generation() -> int:
    """Best-effort TPU generation (4, 5, 6, ...); 0 when not on TPU."""
    try:
        dev = jax.devices()[0]
        if dev.platform != "tpu":
            return 0
        kind = getattr(dev, "device_kind", "") or ""
        for tok in kind.replace("TPU", "").replace("v", " ").split():
            if tok and tok[0].isdigit():
                return int("".join(ch for ch in tok if ch.isdigit()))
    except Exception:
        pass
    return 0


@dataclass
class _BackendReq:
    checker: Callable[..., bool]
    reason: str = ""


def backend_requirement(
    backend_checks: dict[str, Callable[..., bool]],
    heuristic: Callable[..., str] | None = None,
):
    """Decorator: validate/auto-select a ``backend=`` kwarg.

    TPU re-design of reference `backend_requirement` (flashinfer/utils.py:1164):
    the decorated function receives ``backend`` ("auto" → heuristic pick).
    Each checker returns True when the backend supports the given args.
    """

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, backend: str = "auto", **kwargs):
            if backend == "auto":
                if heuristic is not None:
                    backend_ = heuristic(*args, **kwargs)
                else:
                    backend_ = next(
                        (
                            name
                            for name, chk in backend_checks.items()
                            if chk(*args, **kwargs)
                        ),
                        None,
                    )
                if backend_ is None:
                    raise ValueError(
                        f"No supported backend for {fn.__name__} with given args"
                    )
            else:
                if backend not in backend_checks:
                    raise ValueError(
                        f"Unknown backend {backend!r} for {fn.__name__}; "
                        f"choices: {sorted(backend_checks)}"
                    )
                if not backend_checks[backend](*args, **kwargs):
                    raise ValueError(
                        f"Backend {backend!r} does not support the given args "
                        f"for {fn.__name__}"
                    )
                backend_ = backend
            return fn(*args, backend=backend_, **kwargs)

        wrapper._backends = sorted(backend_checks)
        return wrapper

    return deco


# ---------------------------------------------------------------------------
# Dtype helpers
# ---------------------------------------------------------------------------

FP8_E4M3 = jnp.float8_e4m3fn
FP8_E5M2 = jnp.float8_e5m2

FP8_E4M3_MAX = 448.0
FP8_E5M2_MAX = 57344.0
FP4_E2M1_MAX = 6.0

# e2m1 representable magnitudes (FP4): sign x {0, .5, 1, 1.5, 2, 3, 4, 6}
E2M1_VALUES = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0], dtype=np.float32)


def is_float8(dtype) -> bool:
    return dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2)


def asarray_i32(x) -> jax.Array:
    return jnp.asarray(x, dtype=jnp.int32)


def to_np_i32(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int32)


# ---------------------------------------------------------------------------
# LSE-merge algebra (SURVEY §2.9): the associative merge of (value, lse)
# attention states — foundation for split-KV, cascade, ring attention and
# DCP reduction alike (reference include/flashinfer/attention/state.cuh).
# ---------------------------------------------------------------------------


def merge_attention_states(
    v_a: jax.Array, lse_a: jax.Array, v_b: jax.Array, lse_b: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Merge two partial attention states.

    v: [..., head_dim] float; lse: [...] (log-sum-exp, natural log, f32).
    Returns the merged (v, lse). Fully associative & commutative.
    """
    lse_a = lse_a.astype(jnp.float32)
    lse_b = lse_b.astype(jnp.float32)
    lse_max = jnp.maximum(lse_a, lse_b)
    # Guard -inf (empty state) to avoid NaN from (-inf) - (-inf).
    safe_max = jnp.where(jnp.isneginf(lse_max), 0.0, lse_max)
    w_a = jnp.exp(lse_a - safe_max)
    w_b = jnp.exp(lse_b - safe_max)
    denom = w_a + w_b
    lse_out = jnp.where(
        jnp.isneginf(lse_max), -jnp.inf, jnp.log(denom) + safe_max
    )
    scale_a = (w_a / jnp.where(denom == 0, 1.0, denom))[..., None]
    scale_b = (w_b / jnp.where(denom == 0, 1.0, denom))[..., None]
    v_out = v_a.astype(jnp.float32) * scale_a + v_b.astype(jnp.float32) * scale_b
    return v_out.astype(v_a.dtype), lse_out
