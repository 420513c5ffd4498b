"""DeepGEMM-compatible FP8 groupwise GEMM entry points.

Capability parity with reference flashinfer/deep_gemm.py (the JIT-compiled
DeepGEMM port: `fp8_gemm_nt`, `m_grouped_fp8_gemm_nt_contiguous` :1440,
`m_grouped_fp8_gemm_nt_masked` — per-128×128-block weight scales ×
per-(token,128-k-group) activation scales). The reference downloads
arch-specific cubins (artifacts.py DEEPGEMM); on TPU the same contracts
route to the Pallas fused-dequant groupwise kernel / ragged grouped GEMM.

NT convention: ``b`` is [N, K] row-major (transposed), matching DeepGEMM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gemm import grouped_mm_fp8, mm_fp8


def fp8_gemm_nt(
    a: tuple[jax.Array, jax.Array],  # (x [M, K] fp8, x_scale [M, K//128])
    b: tuple[jax.Array, jax.Array],  # (w [N, K] fp8, w_scale [N//128, K//128])
    out: jax.Array | None = None,
    out_dtype=jnp.bfloat16,
    **_ignored,
) -> jax.Array:
    """Groupwise FP8 GEMM, DeepGEMM NT layout (reference deep_gemm.py)."""
    del out
    x, x_scale = a
    w, w_scale = b
    return mm_fp8(
        x, jnp.swapaxes(w, 0, 1), x_scale, jnp.swapaxes(w_scale, 0, 1),
        out_dtype=out_dtype,
    )


def m_grouped_fp8_gemm_nt_contiguous(
    a: tuple[jax.Array, jax.Array],  # (x [T, K] fp8, x_scale [T, K//128])
    b: tuple[jax.Array, jax.Array],  # (w [G, N, K] fp8, w_scale [G, N//128, K//128])
    d: jax.Array | None = None,  # preallocated out (ignored; functional)
    m_indices: jax.Array | None = None,  # [T] group id per row, -1 = skip
    out_dtype=jnp.bfloat16,
    **_ignored,
) -> jax.Array:
    """Contiguous-grouped FP8 GEMM (reference deep_gemm.py:1440): rows are
    sorted by expert; ``m_indices[i]`` names row i's group."""
    del d
    x, x_scale = a
    w, w_scale = b
    g = w.shape[0]
    if m_indices is None:
        raise ValueError("m_indices required")
    # contiguous rows per group → group_sizes via bincount (masked rows = -1)
    valid = m_indices >= 0
    sizes = jnp.bincount(
        jnp.where(valid, m_indices, g), length=g + 1
    ).astype(jnp.int32)[:g]
    out = grouped_mm_fp8(
        x, x_scale, jnp.swapaxes(w, 1, 2),
        jnp.swapaxes(w_scale, 1, 2), sizes, out_dtype=out_dtype,
    )
    return jnp.where(valid[:, None], out, 0)


def m_grouped_fp8_gemm_nt_masked(
    a: tuple[jax.Array, jax.Array],  # (x [G, M_max, K], x_scale [G, M_max, K//128])
    b: tuple[jax.Array, jax.Array],  # (w [G, N, K], w_scale [G, N//128, K//128])
    d: jax.Array | None = None,
    masked_m: jax.Array | None = None,  # [G] valid rows per group
    expected_m: int | None = None,
    out_dtype=jnp.bfloat16,
    **_ignored,
) -> jax.Array:
    """Masked-grouped FP8 GEMM (reference deep_gemm.py m_grouped_..._masked):
    fixed M_max slots per group, ``masked_m`` valid."""
    del d, expected_m
    x, x_scale = a
    w, w_scale = b
    g, m_max, k = x.shape
    xf = x.astype(jnp.float32).reshape(g, m_max, k // 128, 128)
    xdq = (xf * x_scale.astype(jnp.float32)[..., None]).reshape(g, m_max, k)
    n = w.shape[1]
    wf = w.astype(jnp.float32).reshape(g, n // 128, 128, k // 128, 128)
    wdq = (wf * w_scale.astype(jnp.float32)[:, :, None, :, None]).reshape(
        g, n, k)
    out = jnp.einsum(
        "gmk,gnk->gmn", xdq.astype(jnp.bfloat16), wdq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if masked_m is not None:
        row = jnp.arange(m_max)
        out = jnp.where(
            (row[None, :] < masked_m[:, None])[..., None], out, 0.0
        )
    return out.astype(out_dtype)
