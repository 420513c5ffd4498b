"""Concat ops for MLA pipelines.

Capability parity with reference flashinfer/concat_ops.py:87
(`concat_mla_absorb_q`, `concat_mla_k`; kernel
include/flashinfer/concat_mla.cuh): fuse the (nope | pe) concatenations
MLA needs around attention. On TPU these are pure layout ops XLA fuses
into the adjacent matmul/kernel, so jnp.concatenate IS the kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def concat_mla_absorb_q(
    q_nope: jax.Array,  # [..., H, D_ckv]
    q_pe: jax.Array,  # [..., H, D_kpe]
) -> jax.Array:
    """Concat absorbed q_nope with q_pe on the last dim (concat_ops.py:87)."""
    return jnp.concatenate([q_nope, q_pe.astype(q_nope.dtype)], axis=-1)


def concat_mla_k(
    ckv: jax.Array,  # [..., D_ckv] (single latent head)
    kpe: jax.Array,  # [..., D_kpe]
) -> jax.Array:
    """Concat compressed-KV latent with rope part → MLA key rows."""
    return jnp.concatenate([ckv, kpe.astype(ckv.dtype)], axis=-1)
