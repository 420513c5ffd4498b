"""Attention-state (value, LSE) merge ops.

Capability parity with reference flashinfer/cascade.py:42-170 and kernels
include/flashinfer/attention/cascade.cuh:45-368 (MergeState, MergeStateInPlace,
MergeStates, VariableLengthMergeStates). The associative LSE-merge algebra
(SURVEY §2.9) is the foundation of cascade, ring attention, and DCP reduction.

TPU re-design: these are elementwise-over-heads ops (no matmul); jnp under
jit is bandwidth-optimal after XLA fusion. `lse` is natural-log, f32,
shape [seq, heads] for v [seq, heads, dim] (reference layout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...utils import merge_attention_states


def merge_state(
    v_a: jax.Array,  # [seq, heads, dim]
    s_a: jax.Array,  # [seq, heads]
    v_b: jax.Array,
    s_b: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Merge two attention states (reference cascade.py:42 / cascade.cuh:45)."""
    return merge_attention_states(v_a, s_a, v_b, s_b)


def merge_state_in_place(
    v: jax.Array,
    s: jax.Array,
    v_other: jax.Array,
    s_other: jax.Array,
    mask: jax.Array | None = None,  # [seq] bool: rows to merge
) -> tuple[jax.Array, jax.Array]:
    """Functional analog of reference cascade.py:170 (returns merged (v, s));
    rows where ``mask`` is False pass through unchanged."""
    mv, ms = merge_attention_states(v, s, v_other, s_other)
    if mask is not None:
        mv = jnp.where(mask[:, None, None], mv, v)
        ms = jnp.where(mask[:, None], ms, s)
    return mv, ms


def merge_states(
    v: jax.Array,  # [seq, num_states, heads, dim]
    s: jax.Array,  # [seq, num_states, heads]
) -> tuple[jax.Array, jax.Array]:
    """Merge N states at once (reference cascade.py:109 / cascade.cuh:214).

    Single-pass softmax-weighted combine — numerically identical to the
    pairwise fold but one fused XLA kernel.
    """
    sf = s.astype(jnp.float32)
    m = jnp.max(sf, axis=1, keepdims=True)  # [seq, 1, heads]
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w = jnp.exp(sf - m_safe)  # [seq, n, heads]
    denom = jnp.sum(w, axis=1)  # [seq, heads]
    denom_safe = jnp.where(denom == 0, 1.0, denom)
    vf = v.astype(jnp.float32)
    out = jnp.einsum("snhd,snh->shd", vf, w) / denom_safe[..., None]
    lse = jnp.where(
        denom == 0, -jnp.inf, jnp.log(denom_safe) + m_safe[:, 0, :]
    )
    return out.astype(v.dtype), lse


def variable_length_merge_states(
    v: jax.Array,  # [total_states, heads, dim] packed
    s: jax.Array,  # [total_states, heads]
    indptr: jax.Array,  # [seq+1]
    max_states: int,
) -> tuple[jax.Array, jax.Array]:
    """Variable-count merge (reference cascade.cuh:368): position i merges
    states v[indptr[i]:indptr[i+1]]. ``max_states`` bounds the per-row count
    (static shape for XLA); rows are gathered then reduced."""
    seq = indptr.shape[0] - 1
    counts = indptr[1:] - indptr[:-1]
    offs = jnp.arange(max_states, dtype=jnp.int32)[None, :]  # [1, m]
    idx = jnp.minimum(indptr[:-1, None] + offs, indptr[1:, None] - 1)
    valid = offs < counts[:, None]  # [seq, m]
    vg = v[idx]  # [seq, m, heads, dim]
    sg = jnp.where(valid[..., None], s[idx], -jnp.inf)  # [seq, m, heads]
    return merge_states(vg, sg)
