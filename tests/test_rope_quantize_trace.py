"""Fused rope+quantize(+append) ops and trace_apply substitution."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu import trace_apply
from flashinfer_tpu.api_logging import flashinfer_api
from flashinfer_tpu.ops.rope import (
    mla_rope_quantize_fp8,
    rope_quantize_fp8,
    rope_quantize_fp8_append_paged_kv_cache,
    apply_rope_pos_ids,
)


def _cos_sin_cache(max_pos, rot_dim, theta=1e4):
    inv = 1.0 / (theta ** (np.arange(0, rot_dim, 2) / rot_dim))
    ang = np.arange(max_pos)[:, None] * inv[None, :]
    return jnp.asarray(
        np.concatenate([np.cos(ang), np.sin(ang)], -1), jnp.float32)


def test_rope_quantize_fp8_matches_unfused():
    rng = np.random.default_rng(0)
    nnz, hq, hkv, rd, nd = 6, 4, 2, 64, 32
    q_rope = jnp.asarray(rng.standard_normal((nnz, hq, rd)), jnp.float32)
    k_rope = jnp.asarray(rng.standard_normal((nnz, hkv, rd)), jnp.float32)
    q_nope = jnp.asarray(rng.standard_normal((nnz, hq, nd)), jnp.float32)
    k_nope = jnp.asarray(rng.standard_normal((nnz, hkv, nd)), jnp.float32)
    pos = jnp.asarray([0, 1, 2, 5, 7, 8], jnp.int32)
    cache = _cos_sin_cache(16, rd)

    qr, kr, qn, kn = rope_quantize_fp8(
        q_rope, k_rope, q_nope, k_nope, cache, pos,
        quant_scale_q=2.0, quant_scale_kv=0.5)
    assert qr.dtype == jnp.float8_e4m3fn
    # unfused reference: rope (neox/non-interleaved) then scale+cast
    q_ref, k_ref = apply_rope_pos_ids(q_rope, k_rope, pos, rotary_dim=rd,
                                      interleave=False)
    np.testing.assert_allclose(
        np.asarray(qr, np.float32), np.asarray(
            (q_ref.astype(jnp.float32) * 2.0).astype(jnp.float8_e4m3fn),
            np.float32),
        rtol=0, atol=0)
    np.testing.assert_allclose(
        np.asarray(kn, np.float32),
        np.asarray((k_nope * 0.5).astype(jnp.float8_e4m3fn), np.float32))


def test_mla_rope_quantize_2d_k():
    rng = np.random.default_rng(1)
    nnz, hq, rd, nd = 4, 8, 64, 512
    q_rope = jnp.asarray(rng.standard_normal((nnz, hq, rd)), jnp.bfloat16)
    k_rope = jnp.asarray(rng.standard_normal((nnz, rd)), jnp.bfloat16)
    q_nope = jnp.asarray(rng.standard_normal((nnz, hq, nd)), jnp.bfloat16)
    k_nope = jnp.asarray(rng.standard_normal((nnz, nd)), jnp.bfloat16)
    cache = _cos_sin_cache(8, rd)
    qr, kr, qn, kn = mla_rope_quantize_fp8(
        q_rope, k_rope, q_nope, k_nope, cache,
        jnp.arange(nnz, dtype=jnp.int32))
    assert kr.shape == (nnz, rd) and kn.shape == (nnz, nd)


def test_rope_quantize_append_paged():
    rng = np.random.default_rng(2)
    nnz, hq, hkv, rd, nd, ps = 3, 4, 2, 32, 32, 4
    d = rd + nd
    q_rope = jnp.asarray(rng.standard_normal((nnz, hq, rd)), jnp.float32)
    k_rope = jnp.asarray(rng.standard_normal((nnz, hkv, rd)), jnp.float32)
    q_nope = jnp.asarray(rng.standard_normal((nnz, hq, nd)), jnp.float32)
    k_nope = jnp.asarray(rng.standard_normal((nnz, hkv, nd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((nnz, hkv, d)), jnp.float32)
    cache = (jnp.zeros((2, ps, hkv, d), jnp.float8_e4m3fn),
             jnp.zeros((2, ps, hkv, d), jnp.float8_e4m3fn))
    q_out, new_cache = rope_quantize_fp8_append_paged_kv_cache(
        q_rope, k_rope, q_nope, k_nope, v,
        _cos_sin_cache(8, rd), jnp.asarray([0, 1, 2], jnp.int32),
        cache, jnp.asarray([0, 1], jnp.int32), jnp.asarray([0, 2], jnp.int32),
        batch_indices=jnp.zeros(3, jnp.int32),
        positions=jnp.asarray([0, 1, 2], jnp.int32), page_size=ps)
    assert q_out.shape == (nnz, hq, d)
    k_new = np.asarray(new_cache[0], np.float32)
    assert np.abs(k_new[0, :3]).sum() > 0  # rows written
    assert np.abs(k_new[0, 3:]).sum() == 0


def test_trace_apply_substitution():
    calls = []

    @flashinfer_api
    def my_kernel(x):
        return x + 1

    assert my_kernel(1) == 2
    trace_apply.enable_apply(
        {my_kernel.__qualname__: lambda x: x + 100})
    try:
        assert my_kernel(1) == 101
        st = trace_apply.stats()
        assert st[(my_kernel.__qualname__, "hit")] == 1
    finally:
        trace_apply.disable_apply()
    assert my_kernel(1) == 2
