"""Grouped matmul with in-kernel dequant (quantized MoE experts stay
quantized in HBM — reference group_gemm_fp8_groupwise, VERDICT r1 #4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.gmm import fused_moe_quant, grouped_matmul_quant


@pytest.mark.parametrize("dtype", ["int8", "fp8", "bf16"])
def test_gmm_matches_ragged_dot(dtype):
    rng = np.random.default_rng(0)
    e, k, n = 4, 256, 512
    gs = np.asarray([37, 0, 140, 5], np.int32)
    ts = int(gs.sum())
    x = jnp.asarray(rng.standard_normal((ts, k)), jnp.float32)
    if dtype == "int8":
        wq = jnp.asarray(rng.integers(-127, 127, (e, k, n)), jnp.int8)
    elif dtype == "fp8":
        wq = jnp.asarray(rng.standard_normal((e, k, n)), jnp.float8_e4m3fn)
    else:
        wq = jnp.asarray(rng.standard_normal((e, k, n)) * 0.1, jnp.bfloat16)
    ws = jnp.asarray(rng.random((e, k // 128, n // 128)) + 0.5, jnp.float32)

    y = grouped_matmul_quant(x, jnp.asarray(gs), wq, ws, tn=256)

    # reference: explicit dequant + ragged_dot
    wf = wq.astype(jnp.float32).reshape(e, k // 128, 128, n // 128, 128)
    wf = (wf * ws[:, :, None, :, None]).reshape(e, k, n)
    import jax

    ref = jax.lax.ragged_dot(x, wf, jnp.asarray(gs),
                             preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=3e-2, atol=3e-2 * np.sqrt(k))


def test_gmm_no_scale():
    rng = np.random.default_rng(1)
    e, k, n = 2, 128, 256
    gs = np.asarray([64, 64], np.int32)
    x = jnp.asarray(rng.standard_normal((128, k)), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((e, k, n)) * 0.1, jnp.bfloat16)
    import jax

    y = grouped_matmul_quant(x, jnp.asarray(gs), wq, None, tn=256)
    ref = jax.lax.ragged_dot(x, wq.astype(jnp.float32), jnp.asarray(gs),
                             preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-2, atol=2e-1)


def test_fused_moe_quant_matches_dequant_path():
    rng = np.random.default_rng(2)
    e, h, i_sz, t, topk = 4, 256, 256, 24, 2
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.bfloat16)
    w13q = jnp.asarray(rng.integers(-127, 127, (e, h, 2 * i_sz)), jnp.int8)
    w13s = jnp.asarray(rng.random((e, h // 128, 2 * i_sz // 128)) * 0.01,
                       jnp.float32)
    w2q = jnp.asarray(rng.integers(-127, 127, (e, i_sz, h)), jnp.int8)
    w2s = jnp.asarray(rng.random((e, i_sz // 128, h // 128)) * 0.01,
                      jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (t, topk)), jnp.int32)
    wts = jnp.full((t, topk), 0.5, jnp.float32)

    out = fused_moe_quant(x, w13q, w13s, w2q, w2s, ids, wts)

    from flashinfer_tpu.ops.moe import fused_moe

    def dq(wq, ws):
        eo, r, c = wq.shape
        wf = wq.astype(jnp.float32).reshape(eo, r // 128, 128, c // 128, 128)
        return (wf * ws[:, :, None, :, None]).reshape(eo, r, c).astype(
            jnp.bfloat16)

    ref = fused_moe(x, dq(w13q, w13s), dq(w2q, w2s), ids, wts)
    # both paths round through bf16 at different points; tolerance scales
    # with the output magnitude
    scale = float(np.max(np.abs(np.asarray(ref)))) + 1e-9
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=0.02 * scale)
