"""ParallelAttention: Ulysses × Ring composition for long-context prefill.

Capability parity with reference flashinfer/parallel_attention/
(`ParallelAttention` parallel_attention.py:12-92 — composes the Ulysses
head-scatter all-to-all with ring-attention KV rotation;
`ParallelConfig` parallel_config.py). On TPU both live inside one
shard_map: Ulysses re-shards [B, S_loc, H, D] → [B, S_glob/u, H_loc, D]
over the `ulysses` axis, then ring attention rotates KV over the `ring`
axis — exactly the reference's 2-D CP decomposition over ICI.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .ring import ring_attention
from .ulysses import gather_heads, scatter_heads


@dataclass(frozen=True)
class ParallelConfig:
    """CP decomposition knobs (reference parallel_config.py)."""

    ulysses_axis: str | None = "ulysses"
    ring_axis: str | None = "ring"
    causal: bool = True


class ParallelAttention:
    """Composable sequence-parallel attention (reference
    parallel_attention.py:12). Call inside shard_map over the configured
    axes; sequence is sharded over (ulysses × ring)."""

    def __init__(self, config: ParallelConfig | None = None) -> None:
        self.config = config or ParallelConfig()

    def __call__(
        self,
        q: jax.Array,  # [B, S_local, H_q, D]
        k: jax.Array,  # [B, S_local, H_kv, D]
        v: jax.Array,
        *,
        sm_scale: float | None = None,
    ) -> jax.Array:
        cfg = self.config
        u = cfg.ulysses_axis
        if u is not None and jax.lax.axis_size(u) > 1:
            # heads scatter over ulysses: sequence gathers within the axis
            q = scatter_heads(q, u)
            k = scatter_heads(k, u)
            v = scatter_heads(v, u)
        if cfg.ring_axis is None:
            raise ValueError("ParallelConfig.ring_axis is required")
        # ring degenerates to one local block-attention step when the ring
        # axis has size 1 (matching the reference's single-rank passthrough)
        o = ring_attention(q, k, v, cfg.ring_axis, causal=cfg.causal,
                           sm_scale=sm_scale)
        if u is not None and jax.lax.axis_size(u) > 1:
            o = gather_heads(o, u)
        return o
