"""Small-batch MoE paths: MonoMoE and BGMV-MoE.

Capability parity with reference flashinfer/fused_moe/{monomoe.py,
bgmv_moe.py} (+ csrc/fused_moe/monomoe/, csrc/bgmv_moe/; design doc
docs/design_docs/monomoe_kernel.md): at decode-time token counts the
permute/grouped-GEMM pipeline is overhead-dominated, so the small-batch
path gathers each token's expert weights directly (batched gather
matrix-vector). On TPU the gather-einsum keeps the MXU busy with a
[T·K, H]×[H, I] batched contraction and XLA fuses the expert gather into
the weight stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .activation import gelu_and_mul, silu_and_mul

_ACTS = {"silu": silu_and_mul, "swiglu": silu_and_mul,
         "gelu": gelu_and_mul, "geglu": gelu_and_mul}


def bgmv_moe(
    hidden: jax.Array,  # [T, H]
    w13: jax.Array,  # [E, H, 2I]
    w2: jax.Array,  # [E, I, H]
    topk_ids: jax.Array,  # [T, K]
    topk_weights: jax.Array,  # [T, K]
    *,
    activation: str = "silu",
    out_dtype=None,
) -> jax.Array:
    """Batched-gather-MV MoE (reference fused_moe/bgmv_moe.py): per
    (token, k) the expert weights are gathered and applied directly —
    optimal when T·K « E·capacity (single-token decode)."""
    t, h = hidden.shape
    k = topk_ids.shape[1]
    act = _ACTS[activation]
    w13_g = w13[topk_ids]  # [T, K, H, 2I]
    w2_g = w2[topk_ids]  # [T, K, I, H]
    xf = hidden.astype(w13.dtype)
    inter = jnp.einsum("th,tkhi->tki", xf, w13_g,
                       preferred_element_type=jnp.float32)
    inter = act(inter)
    y = jnp.einsum("tki,tkih->tkh", inter.astype(w2.dtype), w2_g,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("tkh,tk->th", y, topk_weights.astype(jnp.float32))
    return out.astype(out_dtype or hidden.dtype)


def monomoe_forward(
    hidden: jax.Array,
    w13: jax.Array,
    w2: jax.Array,
    topk_ids: jax.Array,
    topk_weights: jax.Array,
    *,
    activation: str = "silu",
    small_batch_threshold: int = 16,
    out_dtype=None,
) -> jax.Array:
    """MonoMoE (reference fused_moe/monomoe.py): one fused path that picks
    the gather (small T) or permute/grouped-GEMM (large T) strategy."""
    if hidden.shape[0] <= small_batch_threshold:
        return bgmv_moe(hidden, w13, w2, topk_ids, topk_weights,
                        activation=activation, out_dtype=out_dtype)
    from .moe import fused_moe

    return fused_moe(hidden, w13, w2, topk_ids, topk_weights,
                     activation=activation, out_dtype=out_dtype)
