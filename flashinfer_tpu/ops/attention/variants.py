"""Custom attention variants: the six JIT-composable hook points.

TPU re-design of the reference's AttentionVariant mechanism
(include/flashinfer/attention/variant_helper.cuh:29-84, injected as C++
source strings through jit_args — jit/attention/modules.py:1599). On TPU
the hooks are plain Python callables traced straight into the Pallas
kernels: pass an :class:`AttentionVariant` to the attention wrappers /
``run_prefill`` / ``paged_decode_attention`` and each hook is inlined into
the kernel body at jit time (zero call overhead, fully fused by Mosaic).

Hook signatures (all arrays are f32 unless noted):

- ``query_transform(q, info) -> q``: q rows ``[rows, head_dim]`` BEFORE
  the KV sweep. When provided it REPLACES the default ``q * sm_scale``
  pre-scale (the reference's DefaultAttention::QueryTransform) — apply
  ``info.sm_scale`` yourself if you want it.
- ``key_transform(k, info) -> k``: one KV chunk ``[chunk, head_dim]``.
- ``logits_transform(s, info) -> s``: score tile ``[rows, chunk]``
  (pre-masking; ``info.kv_pos``/``info.q_token`` give positions).
- ``logits_mask(info) -> bool [rows, chunk]``: ANDed with the built-in
  causal/window/length masks.
- ``update_m_d(m_prev, l_prev, s, info) -> (m_new, l_new, p)``: replaces
  the online-softmax state update (s is the masked score tile).
- ``output_transform(o, info) -> o``: normalized output rows
  ``[rows, head_dim]`` before the final store.
- ``use_softmax=False`` skips the online softmax entirely: the kernel
  accumulates ``sum(masked_s @ v)`` and performs no normalization
  (reference variant_helper.cuh use_softmax flag).

Row layout note: in the decode kernel, rows are GQA-stacked per kv head
(``rows = num_kv_heads * g8``; row r belongs to kv head ``r // g8`` and
query head ``(r // g8) * group + (r % g8)`` when ``r % g8 < group``). In
the prefill kernels, rows are (token, group) pairs of ONE kv head.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable


@dataclass(frozen=True)
class VariantInfo:
    """Positional/context info handed to every hook (all traced values)."""

    q_token: Any  # [rows, 1] token index of each row within its request
    kv_pos: Any  # [rows, chunk] (or [1, chunk]) absolute kv position
    kv_len: Any  # scalar: request kv length
    qo_len: Any  # scalar: request query length
    sm_scale: float
    chunk_start: Any = 0  # scalar: first kv position of this chunk


@dataclass(frozen=True)
class AttentionVariant:
    """Six hook points, traced into the Pallas kernels (see module doc)."""

    query_transform: Callable | None = None
    key_transform: Callable | None = None
    logits_transform: Callable | None = None
    logits_mask: Callable | None = None
    update_m_d: Callable | None = None
    output_transform: Callable | None = None
    use_softmax: bool = True

    def __hash__(self):  # identity-hash the callables for jit static args
        return hash((
            id(self.query_transform), id(self.key_transform),
            id(self.logits_transform), id(self.logits_mask),
            id(self.update_m_d), id(self.output_transform),
            self.use_softmax,
        ))


# prebuilt variants (reference variants.cuh DefaultAttention flavors)
DefaultAttention = AttentionVariant()


def make_logits_cap_variant(cap: float) -> AttentionVariant:
    """Soft-cap as a user variant (the flag path remains the fast path)."""
    import jax.numpy as jnp

    return AttentionVariant(
        logits_transform=lambda s, info: cap * jnp.tanh(s / cap)
    )
