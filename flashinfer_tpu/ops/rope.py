"""Rotary positional embeddings (RoPE).

Capability parity with reference flashinfer/rope.py (1,742 LoC; kernels
include/flashinfer/pos_enc.cuh:294-808): Llama RoPE, Llama-3.1 scaled RoPE,
cos/sin-cache variants, ragged (indptr) and pos_ids entry points.

TPU re-design: RoPE is a pure elementwise transform — the TPU-native
implementation is jnp traced under jit so XLA fuses it into the surrounding
projection matmuls (fusing into the attention kernel, as the reference's
fused pos_enc path does, would force the attention kernel to re-materialize
cos/sin per page; on TPU the pre-fused q/k transform is strictly better
since q/k are written once to HBM anyway).

The reference's "inplace" variants return the updated arrays here
(functional JAX); callers donate buffers under jit for true in-place.

Conventions (reference rope.py docstrings):
* ``interleave=False``: rotate-half — first half dims pair with second half
  (GPT-NeoX style). ``interleave=True``: even dims pair with odd dims
  (GPT-J style).
* ``rope_dim = head_dim // rotary_dim_factor`` — only the first
  ``rotary_dim`` dims are rotated; the rest pass through.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from ..api_logging import flashinfer_api
from ..trace import ROPE_TRACE
import numpy as np


def _rope_freqs(
    rotary_dim: int,
    rope_theta: float,
    rope_scale: float,
    dtype=jnp.float32,
) -> jax.Array:
    """Per-dim inverse frequencies, 1 / (scale * theta^(2i/d))."""
    i = jnp.arange(0, rotary_dim // 2, dtype=jnp.float32)
    inv_freq = 1.0 / (rope_scale * (rope_theta ** (2.0 * i / rotary_dim)))
    return inv_freq.astype(dtype)


def _llama31_scale_freqs(
    inv_freq: jax.Array,
    low_freq_factor: float,
    high_freq_factor: float,
    scale_factor: float,
    old_context_len: float,
) -> jax.Array:
    """Llama-3.1 frequency rescaling (reference rope.py llama31 variants)."""
    low_freq_wavelen = old_context_len / low_freq_factor
    high_freq_wavelen = old_context_len / high_freq_factor
    wavelen = 2.0 * np.pi / inv_freq
    # three bands: high-freq unchanged, low-freq fully scaled, smooth middle
    smooth = (old_context_len / wavelen - low_freq_factor) / (
        high_freq_factor - low_freq_factor
    )
    scaled = jnp.where(
        wavelen < high_freq_wavelen,
        inv_freq,
        jnp.where(
            wavelen > low_freq_wavelen,
            inv_freq / scale_factor,
            (1.0 - smooth) * inv_freq / scale_factor + smooth * inv_freq,
        ),
    )
    return scaled


def _apply_rotary(
    x: jax.Array,  # [..., nnz, num_heads, head_dim]
    cos: jax.Array,  # [nnz, rotary_dim // 2]
    sin: jax.Array,
    rotary_dim: int,
    interleave: bool,
) -> jax.Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    rot, rest = xf[..., :rotary_dim], xf[..., rotary_dim:]
    cos = cos[..., None, :]  # broadcast over heads: [nnz, 1, rd/2]
    sin = sin[..., None, :]
    if interleave:
        x1 = rot[..., 0::2]
        x2 = rot[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out_rot = jnp.stack([o1, o2], axis=-1).reshape(rot.shape)
    else:
        half = rotary_dim // 2
        x1 = rot[..., :half]
        x2 = rot[..., half:]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out_rot = jnp.concatenate([o1, o2], axis=-1)
    return jnp.concatenate([out_rot, rest], axis=-1).astype(orig_dtype)


def apply_rope_pos_ids(
    q: jax.Array,  # [nnz, num_q_heads, head_dim]
    k: jax.Array,  # [nnz, num_k_heads, head_dim]
    pos_ids: jax.Array,  # [nnz] int
    rotary_dim: int | None = None,
    interleave: bool = False,
    rope_scale: float = 1.0,
    rope_theta: float = 1e4,
) -> tuple[jax.Array, jax.Array]:
    """Apply Llama-style RoPE at explicit positions (reference rope.py
    apply_rope_pos_ids)."""
    head_dim = q.shape[-1]
    rotary_dim = rotary_dim or head_dim
    inv_freq = _rope_freqs(rotary_dim, rope_theta, rope_scale)
    angles = pos_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    return (
        _apply_rotary(q, cos, sin, rotary_dim, interleave),
        _apply_rotary(k, cos, sin, rotary_dim, interleave),
    )


@flashinfer_api(trace=ROPE_TRACE)
def apply_rope(
    q: jax.Array,
    k: jax.Array,
    indptr: jax.Array,  # [batch+1] ragged boundaries
    offsets: jax.Array,  # [batch] per-request position offset
    rotary_dim: int | None = None,
    interleave: bool = False,
    rope_scale: float = 1.0,
    rope_theta: float = 1e4,
) -> tuple[jax.Array, jax.Array]:
    """Ragged-batch RoPE: token i of request b gets position
    ``offsets[b] + (i - indptr[b])`` (reference rope.py apply_rope)."""
    nnz = q.shape[0]
    token_ids = jnp.arange(nnz, dtype=jnp.int32)
    b = jnp.searchsorted(indptr, token_ids, side="right").astype(jnp.int32) - 1
    pos_ids = offsets[b] + token_ids - indptr[b]
    return apply_rope_pos_ids(
        q, k, pos_ids, rotary_dim, interleave, rope_scale, rope_theta
    )


def apply_llama31_rope_pos_ids(
    q: jax.Array,
    k: jax.Array,
    pos_ids: jax.Array,
    rotary_dim: int | None = None,
    interleave: bool = False,
    rope_scale: float = 8.0,
    rope_theta: float = 5e5,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    """Llama-3.1 scaled RoPE at explicit positions."""
    head_dim = q.shape[-1]
    rotary_dim = rotary_dim or head_dim
    inv_freq = _rope_freqs(rotary_dim, rope_theta, 1.0)
    inv_freq = _llama31_scale_freqs(
        inv_freq, low_freq_factor, high_freq_factor, rope_scale,
        float(old_context_len),
    )
    angles = pos_ids.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    return (
        _apply_rotary(q, cos, sin, rotary_dim, interleave),
        _apply_rotary(k, cos, sin, rotary_dim, interleave),
    )


def apply_llama31_rope(
    q: jax.Array,
    k: jax.Array,
    indptr: jax.Array,
    offsets: jax.Array,
    rotary_dim: int | None = None,
    interleave: bool = False,
    rope_scale: float = 8.0,
    rope_theta: float = 5e5,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    old_context_len: int = 8192,
) -> tuple[jax.Array, jax.Array]:
    nnz = q.shape[0]
    token_ids = jnp.arange(nnz, dtype=jnp.int32)
    b = jnp.searchsorted(indptr, token_ids, side="right").astype(jnp.int32) - 1
    pos_ids = offsets[b] + token_ids - indptr[b]
    return apply_llama31_rope_pos_ids(
        q, k, pos_ids, rotary_dim, interleave, rope_scale, rope_theta,
        low_freq_factor, high_freq_factor, old_context_len,
    )


def apply_rope_with_cos_sin_cache(
    positions: jax.Array,  # [nnz]
    query: jax.Array,  # [nnz, num_q_heads * head_dim]
    key: jax.Array,  # [nnz, num_k_heads * head_dim]
    head_size: int,
    cos_sin_cache: jax.Array,  # [max_pos, rotary_dim] = [cos | sin]
    is_neox: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """RoPE from a precomputed cos/sin cache (reference rope.py
    apply_rope_with_cos_sin_cache; vLLM-compatible flat-head layout)."""
    nnz = query.shape[0]
    rotary_dim = cos_sin_cache.shape[-1]
    half = rotary_dim // 2
    entry = cos_sin_cache[positions]  # [nnz, rotary_dim]
    cos, sin = entry[:, :half], entry[:, half:]
    q3 = query.reshape(nnz, -1, head_size)
    k3 = key.reshape(nnz, -1, head_size)
    qo = _apply_rotary(q3, cos, sin, rotary_dim, interleave=not is_neox)
    ko = _apply_rotary(k3, cos, sin, rotary_dim, interleave=not is_neox)
    return qo.reshape(query.shape), ko.reshape(key.shape)


def _fp8_quant(x: jax.Array, scale: float, dtype) -> jax.Array:
    lim = 448.0 if dtype == jnp.float8_e4m3fn else 57344.0
    return jnp.clip(
        x.astype(jnp.float32) * scale, -lim, lim
    ).astype(dtype)


def rope_quantize_fp8(
    q_rope: jax.Array,  # [nnz, H_q, rope_dim]
    k_rope: jax.Array,  # [nnz, H_kv, rope_dim] (GQA) or [nnz, rope_dim] (MLA)
    q_nope: jax.Array | None,
    k_nope: jax.Array | None,
    cos_sin_cache: jax.Array,  # [max_pos, rotary_dim] = [cos | sin]
    pos_ids: jax.Array,
    is_neox: bool = True,
    quantize_dtype=None,
    quant_scale_q: float = 1.0,
    quant_scale_kv: float = 1.0,
    **_out_buffers,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused RoPE + FP8 quantization (reference rope.py:1364): RoPE on the
    rotary parts, quantize rotary and non-rotary parts. MLA layout (2-D k)
    supported. Returns (q_rope, k_rope, q_nope, k_nope) quantized."""
    quantize_dtype = quantize_dtype or jnp.float8_e4m3fn
    rotary_dim = cos_sin_cache.shape[-1]
    half = rotary_dim // 2
    entry = cos_sin_cache[pos_ids]
    cos, sin = entry[:, :half], entry[:, half:]

    mla_k = k_rope.ndim == 2
    k3 = k_rope[:, None] if mla_k else k_rope
    q_r = _apply_rotary(q_rope, cos, sin, rotary_dim, interleave=not is_neox)
    k_r = _apply_rotary(k3, cos, sin, rotary_dim, interleave=not is_neox)
    if mla_k:
        k_r = k_r[:, 0]
    nnz = q_rope.shape[0]
    qn = q_nope if q_nope is not None else jnp.zeros(
        (nnz, q_rope.shape[1], 0), q_rope.dtype)
    kn = k_nope if k_nope is not None else jnp.zeros(
        k_rope.shape[:-1] + (0,), k_rope.dtype)
    return (
        _fp8_quant(q_r, quant_scale_q, quantize_dtype),
        _fp8_quant(k_r, quant_scale_kv, quantize_dtype),
        _fp8_quant(qn, quant_scale_q, quantize_dtype),
        _fp8_quant(kn, quant_scale_kv, quantize_dtype),
    )


def mla_rope_quantize_fp8(q_rope, k_rope, q_nope, k_nope, cos_sin_cache,
                          pos_ids, **kw):
    """MLA layout wrapper (reference rope.py:1286): k tensors are 2-D."""
    return rope_quantize_fp8(q_rope, k_rope, q_nope, k_nope, cos_sin_cache,
                             pos_ids, **kw)


def rope_quantize_fp8_append_paged_kv_cache(
    q_rope: jax.Array,
    k_rope: jax.Array,
    q_nope: jax.Array | None,
    k_nope: jax.Array | None,
    v: jax.Array | None,
    cos_sin_cache: jax.Array,
    pos_ids: jax.Array,
    paged_kv_cache: tuple[jax.Array, jax.Array],
    kv_indices: jax.Array,
    kv_indptr: jax.Array,
    batch_indices: jax.Array,
    positions: jax.Array,
    is_neox: bool = True,
    quantize_dtype=None,
    quant_scale_q: float = 1.0,
    quant_scale_kv: float = 1.0,
    page_size: int = 16,
    kv_layout: str = "NHD",
    **_out_buffers,
):
    """Fused RoPE + FP8 quantize + paged-KV append (reference rope.py:1504).

    Returns ``(q_out, updated_paged_kv_cache)`` where q_out concatenates
    (q_rope | q_nope) quantized — the functional twist on the reference's
    in-place cache write (donate the cache under jit for zero-copy).
    """
    from ..page import append_paged_kv_cache

    q_r, k_r, q_n, k_n = rope_quantize_fp8(
        q_rope, k_rope, q_nope, k_nope, cos_sin_cache, pos_ids,
        is_neox=is_neox, quantize_dtype=quantize_dtype,
        quant_scale_q=quant_scale_q, quant_scale_kv=quant_scale_kv,
    )
    mla = k_rope.ndim == 2
    if mla:
        # MLA cache rows are (ckv | kpe): k_nope is the compressed latent
        k_full = jnp.concatenate([k_n, k_r], axis=-1)[:, None]
        v_full = k_full  # MLA has no separate V; caller slices ckv
    else:
        k_full = jnp.concatenate([k_n, k_r], axis=-1) if k_n.shape[-1] \
            else k_r
        v_full = _fp8_quant(
            v, quant_scale_kv, quantize_dtype or jnp.float8_e4m3fn
        )
    cache = append_paged_kv_cache(
        k_full, v_full, batch_indices, positions, paged_kv_cache,
        kv_indices, kv_indptr, None, kv_layout=kv_layout,
    )
    q_out = jnp.concatenate([q_n, q_r], axis=-1) if q_n.shape[-1] else q_r
    return q_out, cache


# "inplace" API-parity aliases: JAX is functional; these return new arrays.
apply_rope_inplace = apply_rope
apply_rope_pos_ids_inplace = apply_rope_pos_ids
apply_llama31_rope_inplace = apply_llama31_rope
apply_llama31_rope_pos_ids_inplace = apply_llama31_rope_pos_ids
apply_rope_with_cos_sin_cache_inplace = apply_rope_with_cos_sin_cache
