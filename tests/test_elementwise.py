"""RoPE / norm / activation ops vs explicit references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops import activation, norm, rope


def rope_ref(x, pos, theta=1e4, scale=1.0, interleave=False, rotary_dim=None):
    """Naive rotary reference."""
    x = np.asarray(x, np.float32)
    nnz, h, d = x.shape
    rd = rotary_dim or d
    inv = 1.0 / (scale * theta ** (2 * np.arange(rd // 2) / rd))
    ang = np.asarray(pos)[:, None] * inv[None]
    cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
    out = x.copy()
    if interleave:
        x1, x2 = x[..., 0:rd:2], x[..., 1:rd:2]
        out[..., 0:rd:2] = x1 * cos - x2 * sin
        out[..., 1:rd:2] = x2 * cos + x1 * sin
    else:
        x1, x2 = x[..., : rd // 2], x[..., rd // 2 : rd]
        out[..., : rd // 2] = x1 * cos - x2 * sin
        out[..., rd // 2 : rd] = x2 * cos + x1 * sin
    return out


@pytest.mark.parametrize("interleave", [False, True])
@pytest.mark.parametrize("rotary_dim", [None, 64])
def test_rope_pos_ids(rng, interleave, rotary_dim):
    nnz, hq, hk, d = 12, 4, 2, 128
    q = jnp.asarray(rng.standard_normal((nnz, hq, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((nnz, hk, d), dtype=np.float32))
    pos = jnp.asarray(rng.integers(0, 1000, nnz), jnp.int32)
    qo, ko = rope.apply_rope_pos_ids(
        q, k, pos, rotary_dim=rotary_dim, interleave=interleave
    )
    np.testing.assert_allclose(
        np.asarray(qo), rope_ref(q, pos, interleave=interleave, rotary_dim=rotary_dim),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ko), rope_ref(k, pos, interleave=interleave, rotary_dim=rotary_dim),
        rtol=1e-4, atol=1e-4,
    )


def test_rope_ragged(rng):
    indptr = jnp.asarray([0, 3, 8], jnp.int32)
    offsets = jnp.asarray([100, 7], jnp.int32)
    q = jnp.asarray(rng.standard_normal((8, 2, 64), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((8, 2, 64), dtype=np.float32))
    qo, _ = rope.apply_rope(q, k, indptr, offsets)
    pos = np.array([100, 101, 102, 7, 8, 9, 10, 11])
    np.testing.assert_allclose(np.asarray(qo), rope_ref(q, pos), rtol=1e-4, atol=1e-4)


def test_llama31_rope_matches_plain_at_high_freq(rng):
    # with scale factors that leave high-freq bands untouched, the first
    # dims must match plain rope
    q = jnp.asarray(rng.standard_normal((4, 2, 128), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((4, 2, 128), dtype=np.float32))
    pos = jnp.asarray([0, 5, 10, 100], jnp.int32)
    qo, _ = rope.apply_llama31_rope_pos_ids(q, k, pos, rope_theta=5e5)
    qp, _ = rope.apply_rope_pos_ids(q, k, pos, rope_theta=5e5)
    np.testing.assert_allclose(
        np.asarray(qo)[..., :8], np.asarray(qp)[..., :8], rtol=1e-4, atol=1e-4
    )


def test_rmsnorm(rng):
    x = jnp.asarray(rng.standard_normal((5, 256), dtype=np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(256, dtype=np.float32), jnp.bfloat16)
    y = norm.rmsnorm(x, w)
    xf = np.asarray(x, np.float32)
    ref = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * np.asarray(w, np.float32)
    np.testing.assert_allclose(np.asarray(y, np.float32), ref, rtol=2e-2, atol=2e-2)


def test_fused_add_rmsnorm(rng):
    x = jnp.asarray(rng.standard_normal((5, 128), dtype=np.float32))
    r = jnp.asarray(rng.standard_normal((5, 128), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(128, dtype=np.float32))
    y, r2 = norm.fused_add_rmsnorm(x, r, w)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(x) + np.asarray(r), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(norm.rmsnorm(r2, w)), rtol=1e-6
    )


def test_gemma_rmsnorm(rng):
    x = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal(64, dtype=np.float32))
    y = norm.gemma_rmsnorm(x, w)
    xf = np.asarray(x)
    ref = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6) * (1 + np.asarray(w))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_layernorm(rng):
    x = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32))
    g = jnp.asarray(rng.standard_normal(64, dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(64, dtype=np.float32))
    y = norm.layernorm(x, g, b)
    xf = np.asarray(x)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    ref = (xf - mu) / np.sqrt(var + 1e-6) * np.asarray(g) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)


def test_rmsnorm_fp8_quant(rng):
    x = jnp.asarray(rng.standard_normal((4, 128), dtype=np.float32))
    w = jnp.ones(128, jnp.float32)
    qv, scale = norm.rmsnorm_fp8_quant(x, w)
    assert qv.dtype == jnp.float8_e4m3fn
    deq = np.asarray(qv.astype(jnp.float32)) * np.asarray(scale)
    ref = np.asarray(norm.rmsnorm(x, w))
    np.testing.assert_allclose(deq, ref, rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize(
    "fn,act",
    [
        (activation.silu_and_mul, lambda g: g / (1 + np.exp(-g))),
        (
            activation.gelu_tanh_and_mul,
            lambda g: 0.5 * g * (1 + np.tanh(0.7978845608 * (g + 0.044715 * g**3))),
        ),
    ],
)
def test_activations(rng, fn, act):
    x = jnp.asarray(rng.standard_normal((6, 512), dtype=np.float32))
    y = fn(x)
    xf = np.asarray(x)
    ref = act(xf[:, :256]) * xf[:, 256:]
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-4)
