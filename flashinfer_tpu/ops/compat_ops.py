"""Remaining reference public-API surface: fusion variants and helpers.

Every name here appears in reference flashinfer/__init__.py exports;
implementations are functional TPU equivalents (XLA fuses the simple
chains — quantizing epilogues, DiT layernorm fusions, weight reorders —
into single passes, which is the entire point of the reference's fused
CUDA kernels).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from ..utils import FP8_E4M3_MAX
from .activation import silu_and_mul
from .norm import layernorm, rmsnorm, fused_add_rmsnorm
from .quantization import fp4_quantize, fp8_quantize, mxfp8_quantize
from .ssm import recurrent_kda


# ---------------------------------------------------------------------------
# Norm + quantize fusions (reference flashinfer/norm/ *_quant kernels)
# ---------------------------------------------------------------------------


def _fp8(x, scale):
    return jnp.clip(
        x.astype(jnp.float32) / scale, -FP8_E4M3_MAX, FP8_E4M3_MAX
    ).astype(jnp.float8_e4m3fn)


def rmsnorm_quant(x, weight, scale, eps: float = 1e-6):
    """RMSNorm → FP8 quantize (reference norm rmsnorm_quant)."""
    return _fp8(rmsnorm(x, weight, eps=eps), scale)


def layernorm_quant(x, gamma, beta, scale, eps: float = 1e-6):
    """LayerNorm → FP8 quantize."""
    return _fp8(layernorm(x, gamma, beta, eps=eps), scale)


def fused_add_rmsnorm_quant(x, residual, weight, scale, eps: float = 1e-6):
    """residual-add → RMSNorm → FP8 quantize; returns (q, new_residual)."""
    normed, new_res = fused_add_rmsnorm(x, residual, weight, eps=eps)
    return _fp8(normed, scale), new_res


def rmsnorm_fp4quant(x, weight, eps: float = 1e-6, sf_vec_size: int = 16):
    """RMSNorm → NVFP4 quantize (reference cute-dsl rmsnorm_fp4quant);
    returns (packed, scales)."""
    return fp4_quantize(rmsnorm(x, weight, eps=eps), sf_vec_size=sf_vec_size)


# ---------------------------------------------------------------------------
# DiT layernorm fusions (reference flashinfer/norm/ DiT kernels)
# ---------------------------------------------------------------------------


def fused_dit_residual_layernorm_scale_shift(
    x, residual, gate, scale, shift, eps: float = 1e-6
):
    """DiT: h = x*gate + residual; y = LN(h)*(1+scale) + shift
    (reference fused DiT residual-layernorm-scale-shift); returns (y, h)."""
    h = x.astype(jnp.float32) * gate + residual.astype(jnp.float32)
    ln = layernorm(h, jnp.ones(h.shape[-1:], jnp.float32),
                   jnp.zeros(h.shape[-1:], jnp.float32), eps=eps)
    y = ln.astype(jnp.float32) * (1.0 + scale) + shift
    return y.astype(x.dtype), h.astype(x.dtype)


def fused_dit_gate_residual_layernorm_scale_shift(
    x, residual, gate, scale, shift, eps: float = 1e-6
):
    """Gated variant (gate applied per-token: gate may be [B, 1, H])."""
    return fused_dit_residual_layernorm_scale_shift(
        x, residual, gate, scale, shift, eps=eps
    )


def fused_dit_gate_residual_layernorm_gamma_beta(
    x, residual, gate, gamma, beta, eps: float = 1e-6
):
    """DiT: h = x*gate + residual; y = LN(h; gamma, beta); returns (y, h)."""
    h = x.astype(jnp.float32) * gate + residual.astype(jnp.float32)
    y = layernorm(h, gamma, beta, eps=eps)
    return y.astype(x.dtype), h.astype(x.dtype)


# ---------------------------------------------------------------------------
# Activation fusions
# ---------------------------------------------------------------------------


def is_gated_activation(act) -> bool:
    """Gated-activation predicate (reference activation helper)."""
    name = getattr(act, "name", act)
    return str(name).lower() in ("swiglu", "geglu", "silu", "gelu",
                                 "silu_and_mul", "gelu_and_mul")


def silu_and_mul_nvfp4_quantize(x, global_scale=None, sf_vec_size: int = 16):
    """silu(gate)*up → NVFP4 quantize; returns (packed, scales)."""
    return fp4_quantize(
        silu_and_mul(x), global_scale=global_scale, sf_vec_size=sf_vec_size
    )


def silu_and_mul_scaled_nvfp4_experts_quantize(
    x, group_sizes=None, global_scales=None, sf_vec_size: int = 16
):
    """Per-expert grouped variant (reference expert-quantize fusion)."""
    del group_sizes
    gs = global_scales if global_scales is None or jnp.ndim(
        global_scales) == 0 else None
    return fp4_quantize(silu_and_mul(x), global_scale=gs,
                        sf_vec_size=sf_vec_size)


# ---------------------------------------------------------------------------
# NVFP4 KV-cache quantization family (reference csrc/fp4_kv_quantization.cu)
# ---------------------------------------------------------------------------


def nvfp4_kv_quantize(k, v, sf_vec_size: int = 16):
    """Quantize K/V token rows to NVFP4; returns ((kq, ks), (vq, vs))."""
    return fp4_quantize(k, sf_vec_size=sf_vec_size), fp4_quantize(
        v, sf_vec_size=sf_vec_size)


def nvfp4_kv_dequantize(packed, scales, sf_vec_size: int = 16,
                        dtype=jnp.bfloat16):
    from .quantization import fp4_dequantize

    return fp4_dequantize(packed, scales, sf_vec_size=sf_vec_size,
                          dtype=dtype)


def nvfp4_kv_dequantize_paged(packed_cache, scale_cache,
                              sf_vec_size: int = 16, dtype=jnp.bfloat16):
    """Paged variant: same math; pages are just the leading dim."""
    return nvfp4_kv_dequantize(packed_cache, scale_cache,
                               sf_vec_size=sf_vec_size, dtype=dtype)


def nvfp4_quantize_paged_kv_cache(k_cache, v_cache, sf_vec_size: int = 16):
    return nvfp4_kv_quantize(k_cache, v_cache, sf_vec_size=sf_vec_size)


def nvfp4_quantize_append_paged_kv_cache(
    append_key, append_value, batch_indices, positions,
    paged_kv_packed, paged_kv_scales, kv_indices, kv_indptr,
    kv_last_page_len=None, sf_vec_size: int = 16, kv_layout: str = "NHD",
):
    """Quantize new K/V to NVFP4 and append packed codes + scales into the
    paged caches (reference page.cuh:441 NVFP4 append); returns the updated
    ((k_packed, v_packed), (k_scales, v_scales)) caches."""
    from ..page import append_paged_kv_cache

    (kq, ks), (vq, vs) = nvfp4_kv_quantize(append_key, append_value,
                                           sf_vec_size=sf_vec_size)
    packed = append_paged_kv_cache(
        kq, vq, batch_indices, positions, paged_kv_packed, kv_indices,
        kv_indptr, kv_last_page_len, kv_layout=kv_layout)
    scales = append_paged_kv_cache(
        ks, vs, batch_indices, positions, paged_kv_scales, kv_indices,
        kv_indptr, kv_last_page_len, kv_layout=kv_layout)
    return packed, scales


def nvfp4_quantize_append_paged_kv_cache_with_slot_mapping(
    append_key, append_value, slot_mapping, paged_kv_packed,
    paged_kv_scales, page_size: int, sf_vec_size: int = 16,
):
    """vLLM-style flat slot-mapping variant: slot = page*page_size + offset."""
    (kq, ks), (vq, vs) = nvfp4_kv_quantize(append_key, append_value,
                                           sf_vec_size=sf_vec_size)
    page = slot_mapping // page_size
    off = slot_mapping % page_size

    def put(cache, knew, vnew):
        kc, vc = cache
        return kc.at[page, off].set(knew), vc.at[page, off].set(vnew)

    return put(paged_kv_packed, kq, vq), put(paged_kv_scales, ks, vs)


def nvfp4_batched_quantize(x, global_scale=None, sf_vec_size: int = 16):
    """Batched NVFP4 quantize (leading batch dims pass through)."""
    return fp4_quantize(x, global_scale=global_scale,
                        sf_vec_size=sf_vec_size)


def nvfp4_quantize_smooth(x, smooth_scale, global_scale=None,
                          sf_vec_size: int = 16):
    """SmoothQuant-style: divide by per-channel smoothing scale, then
    NVFP4 quantize (reference nvfp4_smooth_quantize_sm100.cu)."""
    xs = x.astype(jnp.float32) / smooth_scale.astype(jnp.float32)
    return fp4_quantize(xs, global_scale=global_scale,
                        sf_vec_size=sf_vec_size)


def mxfp8_grouped_quantize(x, group_sizes=None, block_size: int = 32):
    """Grouped MXFP8 quantize (reference fp8_quantization.py
    mxfp8_grouped_quantize). The reference needs the group split because
    its kernel tiles scale blocks over a [sum(m_i), k] buffer where a
    block may straddle two groups' rows; here scale blocks are computed
    strictly per row along the last dim (mxfp8_quantize reshapes to
    [..., k/32, 32]), so a block can never span rows — and therefore
    never spans groups. group_sizes is accepted for API parity and is a
    no-op by construction, not an unimplemented path."""
    del group_sizes
    return mxfp8_quantize(x, block_size=block_size)


def mxfp8_dequantize_host(q, scale, block_size: int = 32,
                          dtype=jnp.float32):
    from .quantization import mxfp8_dequantize

    return mxfp8_dequantize(q, scale, block_size=block_size, dtype=dtype)


def mxfp4_dequantize_host(packed, scales, dtype=jnp.float32):
    from .quantization import mxfp4_dequantize

    return mxfp4_dequantize(packed, scales, dtype=dtype)


def get_fp4_quantization_module(*a, **k):
    """JIT-module accessor parity (reference jit op loader): the TPU build
    has no JIT .so modules — returns the quantization namespace."""
    from . import quantization

    return quantization


# ---------------------------------------------------------------------------
# GEMM extras
# ---------------------------------------------------------------------------


def mm_bf16_fp4(a, b_packed, b_scale, sf_block: int = 16,
                out_dtype=jnp.bfloat16, **kw):
    """bf16-activation × FP4-weight GEMM (reference mm_bf16_fp4)."""
    from .gemm import mm_fp4

    return mm_fp4(a, b_packed, b_scale, sf_block=sf_block,
                  out_dtype=out_dtype, **kw)


def mm_nvfp4_svdquant(
    a, b_packed, b_scale, lora_down, lora_up, sf_block: int = 16,
    out_dtype=jnp.bfloat16,
):
    """SVDQuant GEMM (reference nvfp4_svdquant_gemm_*): FP4 main branch +
    bf16 low-rank correction: ``y = a @ W_fp4 + (a @ L1) @ L2``."""
    from .gemm import mm_fp4

    main = mm_fp4(a, b_packed, b_scale, sf_block=sf_block,
                  out_dtype=jnp.float32)
    lora = jnp.dot(
        jnp.dot(a.astype(jnp.bfloat16), lora_down.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        lora_up.astype(jnp.bfloat16), preferred_element_type=jnp.float32,
    )
    return (main + lora).astype(out_dtype)


def svdquant_linear(a, b_packed, b_scale, lora_down, lora_up, bias=None,
                    **kw):
    out = mm_nvfp4_svdquant(a, b_packed, b_scale, lora_down, lora_up, **kw)
    if bias is not None:
        out = out + bias
    return out


def prepare_bf16_fp4_weights(w, sf_block: int = 16):
    """Quantize bf16 weights [K, N] to the FP4-GEMM layout; returns
    (packed [K, N//2], scales [K//sf_block, N])."""
    from .quantization import e2m1_encode, pack_e2m1
    import numpy as np

    k, n = w.shape
    wf = jnp.asarray(w, jnp.float32).reshape(k // sf_block, sf_block, n)
    amax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(amax, 1e-12) / 6.0  # [k//sf, n]
    codes = e2m1_encode(wf / scale[:, None, :]).reshape(k, n)
    from .gemm_pallas import pack_fp4_weights_for_gemm

    return pack_fp4_weights_for_gemm(codes), scale


def prepare_low_latency_gemm_weights(w, *a, **k):
    """trtllm low-latency GEMM pre-shuffle (reference
    trtllm_low_latency_gemm.py:236) — identity on TPU (no shuffled-weight
    kernel; XLA's dot consumes row-major directly)."""
    return w


def tgv_gemm_sm100(a, b, bias=None, out_dtype=jnp.bfloat16, **kw):
    """TGV small-M latency GEMM (reference gemm tgv_gemm_sm100): XLA dot
    already emits the latency-optimal small-M path on TPU."""
    out = jnp.dot(a, b, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def reorder_rows_for_gated_act_gemm(x):
    """Interleave [gate-half | up-half] rows: [r0..rN/2 | ...] →
    [r0, rN/2, r1, rN/2+1, ...] (reference fused_moe/core.py:235)."""
    m = x.shape[0]
    idx = jnp.arange(m) // 2 + (jnp.arange(m) % 2) * (m // 2)
    return x[idx]


# ---------------------------------------------------------------------------
# Attention extras
# ---------------------------------------------------------------------------


def single_prefill_with_kv_cache_return_lse(*args, **kwargs):
    from .attention.prefill import single_prefill_with_kv_cache

    return single_prefill_with_kv_cache(*args, return_lse=True, **kwargs)


def trtllm_fmha_v2_prefill(q, k, v, *, causal: bool = True,
                           sm_scale=None, **kw):
    """fmha_v2 prefill surface (reference prefill.py:190) — one TPU
    backend."""
    from .attention.prefill import single_prefill_with_kv_cache

    return single_prefill_with_kv_cache(q, k, v, causal=causal,
                                        sm_scale=sm_scale)


def trtllm_sage_attention_quantize(
    query, key, value, q_block_size: int = 1, k_block_size: int = 16,
    qk_quant_dtype=jnp.int8,
):
    """SageAttention quantization (reference prefill.py:4334): Q/K get
    per-token-block scales (int8 or fp8-e4m3), V per-head-channel fp8.
    Returns (q_q, q_scale, k_q, k_scale, v_q, v_scale)."""
    def blockq(x, bs):
        t, h, d = x.shape
        pad = (-t) % bs
        xf = jnp.pad(x.astype(jnp.float32), ((0, pad), (0, 0), (0, 0)))
        xb = xf.reshape((t + pad) // bs, bs, h, d)
        amax = jnp.max(jnp.abs(xb), axis=(1, 3), keepdims=True)
        if qk_quant_dtype == jnp.int8:
            s = jnp.maximum(amax, 1e-12) / 127.0
            qv = jnp.clip(jnp.round(xb / s), -127, 127).astype(jnp.int8)
        else:
            s = jnp.maximum(amax, 1e-12) / FP8_E4M3_MAX
            qv = (xb / s).astype(jnp.float8_e4m3fn)
        return (qv.reshape(t + pad, h, d)[:t],
                s[:, 0, :, 0])  # [blocks, h]

    q_q, q_s = blockq(query, q_block_size)
    k_q, k_s = blockq(key, k_block_size)
    v_amax = jnp.max(jnp.abs(value.astype(jnp.float32)), axis=0,
                     keepdims=True)  # per (head, channel)
    v_s = jnp.maximum(v_amax, 1e-12) / FP8_E4M3_MAX
    v_q = (value.astype(jnp.float32) / v_s).astype(jnp.float8_e4m3fn)
    return q_q, q_s, k_q, k_s, v_q, v_s[0]


def nvfp4_attention_sm120_quantize_qkv(q, k, v, sf_vec_size: int = 16):
    """FP4-QKV attention quantization (reference nvfp4_attention_sm120):
    returns per-tensor (packed, scales) triples."""
    return (fp4_quantize(q, sf_vec_size=sf_vec_size),
            fp4_quantize(k, sf_vec_size=sf_vec_size),
            fp4_quantize(v, sf_vec_size=sf_vec_size))


def nvfp4_attention_sm120_fwd(
    q_pack, k_pack, v_pack, *, causal: bool = True, sm_scale=None,
    sf_vec_size: int = 16, out_dtype=jnp.bfloat16,
):
    """FP4-QKV attention: dequantize (TPU has no fp4 unit) + prefill."""
    from .quantization import fp4_dequantize
    from .attention.prefill import single_prefill_with_kv_cache

    q = fp4_dequantize(*q_pack, sf_vec_size=sf_vec_size, dtype=out_dtype)
    k = fp4_dequantize(*k_pack, sf_vec_size=sf_vec_size, dtype=out_dtype)
    v = fp4_dequantize(*v_pack, sf_vec_size=sf_vec_size, dtype=out_dtype)
    return single_prefill_with_kv_cache(q, k, v, causal=causal,
                                        sm_scale=sm_scale)


# ---------------------------------------------------------------------------
# Routed-MoE variants (precomputed top-k), KDA decode, misc
# ---------------------------------------------------------------------------


def trtllm_fp8_per_tensor_scale_routed_moe(topk_ids, topk_weights,
                                           hidden_states, gemm1_weights,
                                           output1_scales_scalar,
                                           gemm2_weights,
                                           output2_scales_scalar, **kw):
    from .moe import fused_moe

    w13 = jnp.swapaxes(gemm1_weights, 1, 2)
    w2 = jnp.swapaxes(gemm2_weights, 1, 2)
    return fused_moe(hidden_states, w13, w2, topk_ids, topk_weights,
                     w13_scale=output1_scales_scalar,
                     w2_scale=output2_scales_scalar,
                     out_dtype=hidden_states.dtype)


def trtllm_fp8_block_scale_routed_moe(topk_ids, topk_weights, hidden_states,
                                      gemm1_weights, gemm1_weights_scale,
                                      gemm2_weights, gemm2_weights_scale,
                                      **kw):
    """fp8 experts stay quantized: transpose the 1-byte tensors to the
    [E, K, N] layout (one int8-width copy, half a bf16 dequant) and ride
    the grouped in-kernel-dequant path (fused_moe block-scale route)."""
    from .moe import fused_moe

    w13 = jnp.swapaxes(gemm1_weights, 1, 2)
    w2 = jnp.swapaxes(gemm2_weights, 1, 2)
    s13 = jnp.swapaxes(gemm1_weights_scale, 1, 2)
    s2 = jnp.swapaxes(gemm2_weights_scale, 1, 2)
    return fused_moe(hidden_states, w13, w2, topk_ids, topk_weights,
                     w13_scale=s13, w2_scale=s2,
                     out_dtype=hidden_states.dtype)


def trtllm_fp4_block_scale_routed_moe(topk_ids, topk_weights, hidden_states,
                                      gemm1_weights, gemm1_weights_scale,
                                      gemm2_weights, gemm2_weights_scale,
                                      sf_block: int = 16, **kw):
    from .moe import fused_moe
    from .gemm_pallas import e2m1_decode

    def dq(packed, scale):
        e, r, c_half = packed.shape
        c = c_half * 2
        lo = e2m1_decode(packed & 0xF)
        hi = e2m1_decode(packed >> 4)
        vals = jnp.stack([lo, hi], -1).reshape(e, r, c)
        vals = vals.reshape(e, r, c // sf_block, sf_block) * scale.astype(
            jnp.float32)[..., None]
        return vals.reshape(e, r, c).astype(jnp.bfloat16)

    w13 = jnp.swapaxes(dq(gemm1_weights, gemm1_weights_scale), 1, 2)
    w2 = jnp.swapaxes(dq(gemm2_weights, gemm2_weights_scale), 1, 2)
    return fused_moe(hidden_states, w13, w2, topk_ids, topk_weights,
                     out_dtype=hidden_states.dtype)


def fused_kda_decode(q, k, v, g, beta, state, state_indices=None, **kw):
    """Single-token KDA decode over a state pool (reference kda_decode.py)."""
    b = q.shape[0]
    idx = state_indices if state_indices is not None else jnp.arange(b)
    s0 = state[idx].astype(jnp.float32)
    out, s_new = recurrent_kda(
        q[:, None], k[:, None], v[:, None], g[:, None], beta[:, None],
        initial_state=s0, output_final_state=True, **kw,
    )
    new_state = state.at[idx].set(s_new.astype(state.dtype))
    return out[:, 0], new_state


def next_positive_power_of_2(x: int) -> int:
    """Reference utils next_positive_power_of_2."""
    return 1 if x <= 1 else 2 ** math.ceil(math.log2(x))


def top_k_varlen(*args, **kwargs):
    from .topk import topk_varlen

    return topk_varlen(*args, **kwargs)


# ---------------------------------------------------------------------------
# Remaining parity surface
# ---------------------------------------------------------------------------

from dataclasses import dataclass, field


@dataclass
class RecurrentKDAPrefillWorkspace:
    """Workspace-handle parity for KDA prefill (reference kda_prefill.py):
    TPU scratch is XLA-managed, so this only carries config."""

    max_tokens: int = 0
    chunk_size: int = 64


def add_rmsnorm_fp4quant(x, residual, weight, eps: float = 1e-6,
                         sf_vec_size: int = 16):
    """residual-add -> RMSNorm -> NVFP4 quantize; returns
    ((packed, scales), new_residual)."""
    normed, new_res = fused_add_rmsnorm(x, residual, weight, eps=eps)
    return fp4_quantize(normed, sf_vec_size=sf_vec_size), new_res


def cute_dsl_fused_moe_nvfp4(hidden_states, topk_ids, topk_weights,
                             w13_packed, w13_scale, w2_packed, w2_scale,
                             sf_block: int = 16, **kw):
    """CuTe-DSL NVFP4 MoE surface (reference fused_moe/cute_dsl/) routed
    to the fp4 block-dequant grouped path."""
    return trtllm_fp4_block_scale_routed_moe(
        topk_ids, topk_weights, hidden_states, w13_packed, w13_scale,
        w2_packed, w2_scale, sf_block=sf_block)


def b12x_fused_moe(*args, **kwargs):
    """B12x grouped-GEMM MoE (reference fused_moe/cute_dsl B12xMoEWrapper
    kernel entry) — one TPU backend."""
    from .moe import fused_moe

    return fused_moe(*args, **kwargs)


class B12xMoEWrapper:
    """Reference B12xMoEWrapper parity: thin object over fused_moe."""

    def __init__(self, *a, **k):
        pass

    def forward(self, hidden_states, w13, w2, topk_ids, topk_weights, **kw):
        from .moe import fused_moe

        return fused_moe(hidden_states, w13, w2, topk_ids, topk_weights,
                         **kw)

    __call__ = forward


CuteDslMoEWrapper = B12xMoEWrapper
