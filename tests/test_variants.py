"""Custom attention variant hooks (reference variant_helper.cuh:29-84):
user callables traced into the Pallas prefill + decode kernels."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.pallas_prefill import (
    build_prefill_plan, run_prefill,
)
from flashinfer_tpu.ops.attention.pallas_decode import paged_decode_attention
from flashinfer_tpu.ops.attention.variants import (
    AttentionVariant, make_logits_cap_variant,
)


def _prefill_setup(qo=70, hq=4, hkv=2, d=128):
    rng = np.random.default_rng(0)
    plan = build_prefill_plan(
        np.asarray([0, qo]), np.asarray([qo]), hq, hkv, causal=True,
        kv_row_starts=np.asarray([0]))
    q = jnp.asarray(rng.standard_normal((qo, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((qo, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((qo, hkv, d)), jnp.float32)
    return plan, q, k, v


def test_prefill_logits_transform_matches_softcap_flag():
    plan, q, k, v = _prefill_setup()
    ref, _ = run_prefill(q, k, v, plan, causal=True, logits_soft_cap=15.0)
    out, _ = run_prefill(q, k, v, plan, causal=True,
                         variant=make_logits_cap_variant(15.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_prefill_query_key_transform():
    plan, q, k, v = _prefill_setup()
    # variant that rescales q by 2*sm_scale and k by 0.5 == baseline
    var = AttentionVariant(
        query_transform=lambda q, info: q * (2.0 * info.sm_scale),
        key_transform=lambda k, info: k * 0.5,
    )
    ref, _ = run_prefill(q, k, v, plan, causal=True)
    out, _ = run_prefill(q, k, v, plan, causal=True, variant=var)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_prefill_logits_mask_sliding_window():
    plan, q, k, v = _prefill_setup()
    wl = 13

    def win_mask(info):
        return info.kv_pos >= info.q_token + (info.kv_len - info.qo_len) - wl

    ref, _ = run_prefill(q, k, v, plan, causal=True, window_left=wl)
    out, _ = run_prefill(q, k, v, plan, causal=True,
                         variant=AttentionVariant(logits_mask=win_mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_prefill_no_softmax():
    plan, q, k, v = _prefill_setup(qo=40)
    var = AttentionVariant(use_softmax=False)
    out, _ = run_prefill(q, k, v, plan, causal=True, variant=var)
    # reference: raw sum over allowed cols of (q k^T * sm_scale) v
    sm = 1.0 / np.sqrt(128)
    g = 2
    kf = jnp.repeat(k, g, axis=1)
    vf = jnp.repeat(v, g, axis=1)
    s = jnp.einsum("qhd,khd->hqk", q * sm, kf)
    mask = np.tril(np.ones((40, 40), bool))
    s = jnp.where(mask[None], s, 0.0)
    ref = jnp.einsum("hqk,khd->qhd", s, vf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_prefill_output_transform_and_update_md():
    plan, q, k, v = _prefill_setup()
    ref, _ = run_prefill(q, k, v, plan, causal=True)

    def umd(m_prev, l_prev, s, info):  # standard online softmax, as a hook
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(
            p, axis=1, keepdims=True)
        return m_new, l_new, p

    var = AttentionVariant(update_m_d=umd,
                           output_transform=lambda o, info: o * 3.0)
    out, _ = run_prefill(q, k, v, plan, causal=True, variant=var)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref) * 3.0,
                               rtol=2e-4, atol=2e-4)


def _decode_setup(batch=3, kv_len=70, ps=16, hq=4, hkv=2, d=128):
    rng = np.random.default_rng(1)
    pages_per = -(-kv_len // ps)
    npages = batch * pages_per
    k_cache = jnp.asarray(
        rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
    v_cache = jnp.asarray(
        rng.standard_normal((npages, ps, hkv, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.float32)
    pt = jnp.asarray(np.arange(npages, dtype=np.int32).reshape(
        batch, pages_per))
    kl = jnp.full((batch,), kv_len, jnp.int32)
    return q, k_cache, v_cache, pt, kl


def test_decode_logits_transform_matches_softcap_flag():
    q, kc, vc, pt, kl = _decode_setup()
    ref, _ = paged_decode_attention(q, kc, vc, pt, kl, logits_soft_cap=9.0)
    out, _ = paged_decode_attention(
        q, kc, vc, pt, kl, variant=make_logits_cap_variant(9.0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_decode_logits_mask_window():
    q, kc, vc, pt, kl = _decode_setup()
    wl = 21

    def win_mask(info):
        return info.kv_pos >= info.q_token - wl

    ref, _ = paged_decode_attention(q, kc, vc, pt, kl, window_left=wl)
    out, _ = paged_decode_attention(
        q, kc, vc, pt, kl, variant=AttentionVariant(logits_mask=win_mask))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
