"""mHC (MiniMax hybrid component / multi-head residual) fusions.

Capability parity with reference flashinfer/mhc.py (`mhc_post` :76,
`mhc_pre_big_fuse` :176, `mhc_pre_big_fuse_with_prenorm` :334): the
multi-head (HC=4) residual stream pre/post mixing around a transformer
layer — RMS-normalized projection logits split into pre(4)/post(4)/
comb(16) factors, sigmoid pre/post gates, Sinkhorn-normalized residual
combination matrix. On TPU the whole fusion is a handful of elementwise
ops + tiny [HC,HC] matmuls that XLA fuses into one pass — no custom
kernel required to be memory-bound-optimal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sinkhorn_normalize(
    x: jax.Array, repeat: int = 20, eps: float = 1e-6
) -> jax.Array:
    """Sinkhorn row/col normalization of [..., HC, HC] logits (reference
    kernel semantics, tests/mhc/test_mhc_pre_big_fuse.py:21)."""
    x = jax.nn.softmax(x, axis=-1) + eps
    x = x / (jnp.sum(x, axis=-2, keepdims=True) + eps)

    def step(x, _):
        x = x / (jnp.sum(x, axis=-1, keepdims=True) + eps)
        x = x / (jnp.sum(x, axis=-2, keepdims=True) + eps)
        return x, None

    x, _ = jax.lax.scan(step, x, None, length=repeat - 1)
    return x


def mhc_post(
    x: jax.Array,  # [..., H]
    residual: jax.Array,  # [..., HC, H]
    post_layer_mix: jax.Array,  # [..., HC] or [..., HC, 1]
    comb_res_mix: jax.Array,  # [..., HC, HC]
) -> jax.Array:
    """``out[..., n, h] = x[..., h] * post[..., n] +
    Σ_o residual[..., o, h] * comb[..., o, n]`` (reference mhc.py:76)."""
    if post_layer_mix.shape[-1] == 1 and post_layer_mix.ndim == residual.ndim:
        post_layer_mix = post_layer_mix[..., 0]
    xf = x.astype(jnp.float32)
    rf = residual.astype(jnp.float32)
    out = (
        xf[..., None, :] * post_layer_mix.astype(jnp.float32)[..., None]
        + jnp.einsum("...oh,...on->...nh", rf, comb_res_mix.astype(jnp.float32))
    )
    return out.astype(residual.dtype)


def mhc_pre_big_fuse(
    dot_mix: jax.Array,  # [..., 24] or [splits, ..., 24]
    sqrsum: jax.Array,  # [...] or [splits, ...]
    residual: jax.Array,  # [..., HC=4, H] bf16
    mhc_scale: jax.Array,  # [3]
    mhc_base: jax.Array,  # [24]
    k: int,
    rms_eps: float = 1e-6,
    mhc_pre_eps: float = 1e-6,
    mhc_sinkhorn_eps: float = 1e-6,
    mhc_post_mult_value: float = 1.0,
    sinkhorn_repeat: int = 20,
    num_splits: int = 1,
    block_size: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """mHC pre-map big-fuse (reference mhc.py:176).

    Returns ``(post_mix [..., HC, 1], comb_mix [..., HC, HC],
    layer_input [..., H])``.
    """
    del num_splits, block_size
    if dot_mix.ndim == residual.ndim:  # leading split axis → reduce
        dot_mix = jnp.sum(dot_mix, axis=0)
        sqrsum = jnp.sum(sqrsum, axis=0)
    hc = residual.shape[-2]
    rstd = jax.lax.rsqrt(
        sqrsum.astype(jnp.float32)[..., None] / float(k) + rms_eps
    )
    mixes = dot_mix.astype(jnp.float32) * rstd
    scale = mhc_scale.astype(jnp.float32)
    base = mhc_base.astype(jnp.float32)

    pre_logits = mixes[..., :hc] * scale[0] + base[:hc]
    post_logits = mixes[..., hc:2 * hc] * scale[1] + base[hc:2 * hc]
    comb_logits = mixes[..., 2 * hc:] * scale[2] + base[2 * hc:]

    pre_mix = jax.nn.sigmoid(pre_logits)[..., None] + mhc_pre_eps
    post_mix = (jax.nn.sigmoid(post_logits) * mhc_post_mult_value)[..., None]
    comb_mix = sinkhorn_normalize(
        comb_logits.reshape(*residual.shape[:-2], hc, hc),
        repeat=sinkhorn_repeat, eps=mhc_sinkhorn_eps,
    )
    layer_input = jnp.sum(
        pre_mix * residual.astype(jnp.float32), axis=-2
    ).astype(residual.dtype)
    return post_mix, comb_mix, layer_input


def mhc_pre_big_fuse_with_prenorm(
    dot_mix: jax.Array,
    residual: jax.Array,
    mhc_scale: jax.Array,
    mhc_base: jax.Array,
    **kw,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Variant computing sqrsum from the residual (reference mhc.py:334)."""
    if dot_mix.ndim == residual.ndim:
        dot_mix = dot_mix[0]
    hc, h = residual.shape[-2], residual.shape[-1]
    sqrsum = jnp.sum(
        jnp.square(residual.astype(jnp.float32).reshape(
            *residual.shape[:-2], hc * h)), axis=-1,
    )
    return mhc_pre_big_fuse(
        dot_mix, sqrsum, residual, mhc_scale, mhc_base, k=hc * h, **kw
    )
