"""Logits processors (reference flashinfer/logits_processor/processors.py).

Each processor declares its (input, output) tensor types; the pipeline
legalizes the chain and fuses adjacent ops. All math delegates to
flashinfer_tpu.ops.sampling kernels.
"""

from __future__ import annotations

import enum
from abc import ABC, abstractmethod
from typing import Any

import jax
import jax.numpy as jnp

from ..ops import sampling as S


class TensorType(enum.Enum):
    LOGITS = "logits"
    PROBS = "probs"
    INDICES = "indices"


class LogitsProcessor(ABC):
    """One pipeline stage (reference processors.py:24)."""

    # (input type(s), output type)
    IN: tuple[TensorType, ...] = (TensorType.LOGITS,)
    OUT: TensorType = TensorType.LOGITS

    def __init__(self, **params: Any) -> None:
        self.params = params

    @abstractmethod
    def apply(self, x: jax.Array, in_type: TensorType, **kw) -> jax.Array:
        ...

    def out_type(self, in_type: TensorType) -> TensorType:
        return self.OUT

    def __repr__(self) -> str:
        return type(self).__name__


class Temperature(LogitsProcessor):
    """logits /= temperature (processors.py:90). Runtime kw: temperature."""

    IN = (TensorType.LOGITS,)
    OUT = TensorType.LOGITS

    def apply(self, x, in_type, *, temperature=1.0, **kw):
        t = jnp.asarray(temperature, jnp.float32)
        t = jnp.where(t <= 0, 1.0, t)
        if t.ndim == 1:  # per-row temperatures
            t = t[:, None]
        return x.astype(jnp.float32) / t


class Softmax(LogitsProcessor):
    """LOGITS → PROBS (processors.py:137)."""

    IN = (TensorType.LOGITS,)
    OUT = TensorType.PROBS

    def apply(self, x, in_type, **kw):
        return S.softmax(x)


class TopK(LogitsProcessor):
    """Top-k restriction (processors.py:193). On LOGITS masks to -inf
    (top_k_mask_logits); on PROBS renormalizes (top_k_renorm_probs).
    Runtime kw: top_k."""

    IN = (TensorType.LOGITS, TensorType.PROBS)

    def out_type(self, in_type):
        return in_type

    def apply(self, x, in_type, *, top_k, **kw):
        if in_type == TensorType.LOGITS:
            return S.top_k_mask_logits(x, top_k)
        return S.top_k_renorm_probs(x, top_k)


class TopP(LogitsProcessor):
    """Nucleus restriction on PROBS (processors.py:272). kw: top_p."""

    IN = (TensorType.PROBS,)
    OUT = TensorType.PROBS

    def apply(self, x, in_type, *, top_p, **kw):
        return S.top_p_renorm_probs(x, top_p)


class MinP(LogitsProcessor):
    """Min-p filter on PROBS (processors.py:322). kw: min_p."""

    IN = (TensorType.PROBS,)
    OUT = TensorType.PROBS

    def apply(self, x, in_type, *, min_p, **kw):
        mp = jnp.asarray(min_p, jnp.float32)
        thresh = mp[..., None] * jnp.max(x, axis=-1, keepdims=True) if mp.ndim else mp * jnp.max(x, axis=-1, keepdims=True)
        masked = jnp.where(x >= thresh, x, 0.0)
        return masked / jnp.sum(masked, axis=-1, keepdims=True)


class Sample(LogitsProcessor):
    """Draw token ids (processors.py:370). kw: key (jax PRNG key)."""

    IN = (TensorType.LOGITS, TensorType.PROBS)
    OUT = TensorType.INDICES

    def __init__(self, deterministic: bool = True, **params):
        super().__init__(deterministic=deterministic, **params)

    def apply(self, x, in_type, *, key=None, **kw):
        if key is None:
            key = jax.random.key(0)
        if in_type == TensorType.LOGITS:
            return S.sampling_from_logits(x, key=key)
        return S.sampling_from_probs(x, key=key)
