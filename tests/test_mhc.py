"""mHC fusion tests vs numpy references (reference tests/mhc/)."""

import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.mhc import (
    mhc_post,
    mhc_pre_big_fuse,
    mhc_pre_big_fuse_with_prenorm,
)


def _np_sinkhorn(x, repeat=20, eps=1e-6):
    e = np.exp(x - x.max(-1, keepdims=True))
    x = e / e.sum(-1, keepdims=True) + eps
    x = x / (x.sum(-2, keepdims=True) + eps)
    for _ in range(repeat - 1):
        x = x / (x.sum(-1, keepdims=True) + eps)
        x = x / (x.sum(-2, keepdims=True) + eps)
    return x


def test_mhc_post():
    rng = np.random.default_rng(0)
    b, hc, h = 3, 4, 32
    x = rng.standard_normal((b, h)).astype(np.float32)
    res = rng.standard_normal((b, hc, h)).astype(np.float32)
    post = rng.standard_normal((b, hc)).astype(np.float32)
    comb = rng.standard_normal((b, hc, hc)).astype(np.float32)
    out = np.asarray(mhc_post(jnp.asarray(x), jnp.asarray(res),
                              jnp.asarray(post), jnp.asarray(comb)))
    ref = x[:, None, :] * post[:, :, None] + np.einsum(
        "boh,bon->bnh", res, comb)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def _np_pre_ref(dot_mix, sqrsum, residual, scale, base, k):
    hc = residual.shape[-2]
    rstd = 1.0 / np.sqrt(sqrsum[..., None] / k + 1e-6)
    mixes = dot_mix * rstd
    sig = lambda z: 1 / (1 + np.exp(-z))
    pre = sig(mixes[..., :hc] * scale[0] + base[:hc])[..., None] + 1e-6
    post = sig(mixes[..., hc:2 * hc] * scale[1] + base[hc:2 * hc])[..., None]
    comb = _np_sinkhorn(
        (mixes[..., 2 * hc:] * scale[2] + base[2 * hc:]).reshape(
            *residual.shape[:-2], hc, hc))
    layer_in = (pre * residual).sum(-2)
    return post, comb, layer_in


def test_mhc_pre_big_fuse():
    rng = np.random.default_rng(1)
    b, hc, h = 4, 4, 64
    dot_mix = rng.standard_normal((b, 24)).astype(np.float32)
    residual = (rng.standard_normal((b, hc, h)) * 0.01).astype(np.float32)
    sqrsum = np.square(residual.reshape(b, -1)).sum(-1)
    scale = (rng.standard_normal(3) * 0.1).astype(np.float32)
    base = (rng.standard_normal(24) * 0.1).astype(np.float32)
    k = hc * h

    post, comb, layer_in = mhc_pre_big_fuse(
        jnp.asarray(dot_mix), jnp.asarray(sqrsum), jnp.asarray(residual),
        jnp.asarray(scale), jnp.asarray(base), k)
    rp, rc, rl = _np_pre_ref(dot_mix, sqrsum, residual, scale, base, k)
    np.testing.assert_allclose(np.asarray(post), rp, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(comb), rc, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(layer_in), rl, rtol=1e-2, atol=1e-2)


def test_mhc_pre_with_prenorm_and_splits():
    rng = np.random.default_rng(2)
    splits, b, hc, h = 4, 2, 4, 32
    dot_mix = rng.standard_normal((splits, b, 24)).astype(np.float32)
    sqrsum = np.abs(rng.standard_normal((splits, b))).astype(np.float32)
    residual = (rng.standard_normal((b, hc, h)) * 0.01).astype(np.float32)
    scale = (rng.standard_normal(3) * 0.1).astype(np.float32)
    base = (rng.standard_normal(24) * 0.1).astype(np.float32)

    post, comb, layer_in = mhc_pre_big_fuse(
        jnp.asarray(dot_mix), jnp.asarray(sqrsum), jnp.asarray(residual),
        jnp.asarray(scale), jnp.asarray(base), k=hc * h)
    rp, rc, rl = _np_pre_ref(dot_mix.sum(0), sqrsum.sum(0), residual,
                             scale, base, hc * h)
    np.testing.assert_allclose(np.asarray(post), rp, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(comb), rc, rtol=2e-3, atol=2e-3)

    # prenorm variant computes sqrsum itself
    post2, comb2, layer2 = mhc_pre_big_fuse_with_prenorm(
        jnp.asarray(dot_mix.sum(0)), jnp.asarray(residual),
        jnp.asarray(scale), jnp.asarray(base))
    ss = np.square(residual.reshape(b, -1)).sum(-1)
    rp2, rc2, rl2 = _np_pre_ref(dot_mix.sum(0), ss, residual, scale, base,
                                hc * h)
    np.testing.assert_allclose(np.asarray(layer2), rl2, rtol=1e-2, atol=1e-2)
