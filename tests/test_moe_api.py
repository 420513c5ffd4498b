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


def test_unsupported_variant_raises():
    w13, w2, x, logits = _mk()
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=4, top_k=2),
        expert=ExpertConfig(intermediate_size=128),
        quant=QuantConfig(variant=QuantVariant.NVFP4),
    )
    with pytest.raises(NotImplementedError):
        create_moe(cfg, w13, w2)


def test_no_finalize_returns_routing():
    w13, w2, x, logits = _mk(key=3)
    cfg = MoEConfig(
        routing=RoutingConfig(num_experts=4, top_k=2),
        expert=ExpertConfig(intermediate_size=128),
        execution=ExecutionConfig(do_finalize=False),
    )
    out, ids, wts = create_moe(cfg, w13, w2)(x, logits)
    assert ids.shape == (8, 2) and wts.shape == (8, 2)
