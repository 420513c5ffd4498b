"""Unified MoE API tests (reference tests for fused_moe/api.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.moe import fused_moe
from flashinfer_tpu.ops.moe_api import (
    ActivationConfig,
    ActivationType,
    ExecutionConfig,
    ExpertConfig,
    MoEConfig,
    QuantConfig,
    QuantVariant,
    RoutingConfig,
    create_moe,
)
from flashinfer_tpu.ops.routing import RoutingMethodType, apply_routing


def _mk(e=4, h=64, i_sz=128, t=8, key=0):
    rng = np.random.default_rng(key)
    w13 = jnp.asarray(rng.standard_normal((e, h, 2 * i_sz)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, i_sz, h)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    return w13, w2, x, logits


def test_bf16_moe_matches_direct_call():
    w13, w2, x, logits = _mk()
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=4, top_k=2,
                              method=RoutingMethodType.Renormalize),
        expert=ExpertConfig(intermediate_size=128),
    )
    moe = create_moe(cfg, w13, w2)
    out = moe(x, logits)
    ids, wts = apply_routing(RoutingMethodType.Renormalize, logits, 2)
    ref = fused_moe(x, w13, w2, ids, wts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fp8_per_tensor_variant():
    w13, w2, x, logits = _mk(key=1)
    scale = jnp.asarray([1.5, 0.5, 2.0, 1.0], jnp.float32)
    w13q = (w13.astype(jnp.float32) / scale[:, None, None]).astype(
        jnp.float8_e4m3fn)
    w2q = (w2.astype(jnp.float32) / scale[:, None, None]).astype(
        jnp.float8_e4m3fn)
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=4, top_k=2),
        expert=ExpertConfig(intermediate_size=128),
        quant=QuantConfig(variant=QuantVariant.FP8PerTensor),
    )
    moe = create_moe(cfg, w13q, w2q, w13_scale=scale, w2_scale=scale)
    out = moe(x.astype(jnp.bfloat16), logits)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())


def test_deepseek_fp8_block_variant():
    e, h, i_sz, t = 2, 128, 128, 4
    w13, w2, x, logits = _mk(e=e, h=h, i_sz=i_sz, t=t, key=2)
    s13 = jnp.ones((e, h // 128, 2 * i_sz // 128), jnp.float32) * 2.0
    s2 = jnp.ones((e, i_sz // 128, h // 128), jnp.float32) * 0.5
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=e, top_k=1),
        expert=ExpertConfig(intermediate_size=i_sz),
        quant=QuantConfig(variant=QuantVariant.DeepSeekFp8),
    )
    moe = create_moe(cfg, w13.astype(jnp.float8_e4m3fn),
                     w2.astype(jnp.float8_e4m3fn),
                     w13_scale=s13, w2_scale=s2)
    out = moe(x.astype(jnp.bfloat16), logits)
    assert out.shape == x.shape


def _bf16_ref(w13, w2, x, logits, top_k=2):
    ids, wts = apply_routing(RoutingMethodType.Renormalize, logits, top_k)
    return np.asarray(fused_moe(x, w13, w2, ids, wts), np.float32)


@pytest.mark.parametrize("variant", [
    QuantVariant.NVFP4, QuantVariant.MXFP4, QuantVariant.MxFp8,
    QuantVariant.MxInt4, QuantVariant.W4A16,
])
def test_quantized_variant_wiring(variant):
    """fp4/mx/int4 experts through the unified API: one-time int8-block
    requantization in the constructor, output close to the bf16 MoE on
    the same (dequantized) weights; weights stored at 1 byte each."""
    from flashinfer_tpu.ops.quantization import (
        fp4_dequantize, fp4_quantize, mxfp8_dequantize, mxfp8_quantize,
    )

    e, h, i_sz = 4, 128, 128
    rng = np.random.default_rng(11)
    w13f = jnp.asarray(rng.standard_normal((e, h, 2 * i_sz)) * 0.1,
                       jnp.float32)
    w2f = jnp.asarray(rng.standard_normal((e, i_sz, h)) * 0.1, jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, h)), jnp.float32)
    logits = jnp.asarray(rng.standard_normal((8, e)), jnp.float32)

    def quantize(wf):
        if variant in (QuantVariant.NVFP4, QuantVariant.MXFP4):
            sf = 16 if variant == QuantVariant.NVFP4 else 32
            q, s = fp4_quantize(wf, sf_vec_size=sf,
                                sf_use_ue8m0=variant == QuantVariant.MXFP4)
            return q, s, fp4_dequantize(q, s, sf_vec_size=sf,
                                        dtype=jnp.float32)
        if variant == QuantVariant.MxFp8:
            q, s = mxfp8_quantize(wf)
            return q, s, mxfp8_dequantize(q, s, dtype=jnp.float32)
        if variant == QuantVariant.MxInt4:
            g = wf.reshape(*wf.shape[:-1], wf.shape[-1] // 32, 32)
            s = jnp.max(jnp.abs(g), -1) / 7.0
            q = jnp.round(g / s[..., None]).astype(jnp.int8)
            deq = (q * s[..., None]).reshape(wf.shape)
            return q.reshape(wf.shape), s, deq
        # W4A16: per-output-channel scales [E, C]
        s = jnp.max(jnp.abs(wf), axis=1) / 7.0
        q = jnp.round(wf / s[:, None, :]).astype(jnp.int8)
        return q, s, (q * s[:, None, :]).astype(jnp.float32)

    q13, s13, deq13 = quantize(w13f)
    q2, s2, deq2 = quantize(w2f)
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=e, top_k=2,
                              method=RoutingMethodType.Renormalize),
        expert=ExpertConfig(intermediate_size=i_sz),
        quant=QuantConfig(variant=variant),
    )
    moe = create_moe(cfg, q13, q2, w13_scale=s13, w2_scale=s2)
    assert moe.w13.dtype == jnp.int8  # stays quantized in HBM
    out = np.asarray(moe(x, logits), np.float32)
    ref = _bf16_ref(deq13.astype(jnp.float32), deq2.astype(jnp.float32),
                    x, logits)
    # int8-block requant error on top of the 4-bit quant: compare vs the
    # dequantized-weights reference with a loose tolerance
    np.testing.assert_allclose(out, ref, rtol=0.1, atol=0.05)


def test_no_finalize_returns_routing():
    w13, w2, x, logits = _mk(key=3)
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=4, top_k=2),
        expert=ExpertConfig(intermediate_size=128),
        execution=ExecutionConfig(do_finalize=False),
    )
    out, ids, wts = create_moe(cfg, w13, w2)(x, logits)
    assert ids.shape == (8, 2) and wts.shape == (8, 2)
