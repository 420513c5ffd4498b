"""Testing utilities: pure-jnp reference implementations and timing helpers.

Parity with reference flashinfer/testing/utils.py (timing: utils.py:774-1317,
FLOPs/bandwidth calculators: utils.py:456-750) — TPU re-design: timing uses
jax block_until_ready with device-time estimation; references are jnp (not
torch) so they run anywhere.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def attention_ref(
    q: jax.Array,  # [qo_len, H_q, D]
    k: jax.Array,  # [kv_len, H_kv, D]
    v: jax.Array,  # [kv_len, H_kv, D]
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    logits_soft_cap: float = 0.0,
    window_left: int = -1,
    custom_mask: jax.Array | None = None,  # [qo_len, kv_len] bool
    sinks: jax.Array | None = None,  # [H_q] attention-sink logits
    return_lse: bool = False,
):
    """Dense reference attention with the reference's masking semantics.

    Causal alignment follows the reference (prefill.cuh): query at row i
    attends kv positions <= kv_len - qo_len + i.
    """
    qo_len, num_q_heads, head_dim = q.shape
    kv_len, num_kv_heads, _ = k.shape
    group = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / np.sqrt(head_dim)

    qf = q.astype(jnp.float32)
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=1)  # [kv, H_q, D]
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=1)

    s = jnp.einsum("qhd,khd->hqk", qf * sm_scale, kf)  # [H_q, qo, kv]
    if logits_soft_cap > 0.0:
        s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)

    qpos = jnp.arange(qo_len)[:, None] + (kv_len - qo_len)
    kpos = jnp.arange(kv_len)[None, :]
    mask = jnp.ones((qo_len, kv_len), dtype=bool)
    if causal:
        mask = kpos <= qpos
    if window_left >= 0:
        mask = jnp.logical_and(mask, kpos >= qpos - window_left)
    if custom_mask is not None:
        mask = jnp.logical_and(mask, custom_mask)
    s = jnp.where(mask[None], s, -jnp.inf)

    m = jnp.max(s, axis=-1, keepdims=True)
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    p = jnp.exp(s - m_safe)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    if sinks is not None:
        sink = jnp.exp(sinks.astype(jnp.float32)[:, None, None] - m_safe)
        denom = denom + sink
    o = jnp.einsum("hqk,khd->qhd", p / jnp.where(denom == 0, 1.0, denom), vf)
    o = o.astype(q.dtype)
    if return_lse:
        lse = (m_safe + jnp.log(denom))[..., 0].T  # [qo, H_q], natural log
        lse = jnp.where(jnp.isneginf(m[..., 0].T) & (sinks is None), -jnp.inf, lse)
        return o, lse
    return o


def make_paged_kv_cache(
    rng: np.random.Generator,
    kv_lens: list[int],
    page_size: int,
    num_kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    shuffle: bool = True,
):
    """Build a random paged KV-cache + CSR page metadata for tests.

    Returns (k_cache, v_cache, kv_indptr, kv_indices, kv_last_page_len,
    dense_k_list, dense_v_list) where dense_* are the per-request contiguous
    views for reference computation.
    """
    pages_per_req = [max(1, -(-l // page_size)) for l in kv_lens]
    total_pages = sum(pages_per_req)
    num_pool_pages = total_pages + 3  # a few spare pages in the pool
    perm = (
        rng.permutation(num_pool_pages)
        if shuffle
        else np.arange(num_pool_pages)
    )

    k_pool = rng.standard_normal(
        (num_pool_pages, page_size, num_kv_heads, head_dim), dtype=np.float32
    )
    v_pool = rng.standard_normal(
        (num_pool_pages, page_size, num_kv_heads, head_dim), dtype=np.float32
    )

    kv_indptr = np.zeros(len(kv_lens) + 1, dtype=np.int32)
    kv_indices = []
    kv_last_page_len = []
    dense_k, dense_v = [], []
    cursor = 0
    k_pool_bf = jnp.asarray(k_pool, dtype=dtype)
    v_pool_bf = jnp.asarray(v_pool, dtype=dtype)
    k_pool_np = np.asarray(k_pool_bf, dtype=np.float32)
    v_pool_np = np.asarray(v_pool_bf, dtype=np.float32)
    for i, (l, npg) in enumerate(zip(kv_lens, pages_per_req)):
        pages = perm[cursor : cursor + npg]
        cursor += npg
        kv_indices.extend(pages.tolist())
        kv_indptr[i + 1] = kv_indptr[i] + npg
        last = l - (npg - 1) * page_size
        kv_last_page_len.append(last)
        dk = k_pool_np[pages].reshape(-1, num_kv_heads, head_dim)[:l]
        dv = v_pool_np[pages].reshape(-1, num_kv_heads, head_dim)[:l]
        dense_k.append(jnp.asarray(dk))
        dense_v.append(jnp.asarray(dv))

    return (
        k_pool_bf,
        v_pool_bf,
        jnp.asarray(kv_indptr),
        jnp.asarray(np.asarray(kv_indices, dtype=np.int32)),
        jnp.asarray(np.asarray(kv_last_page_len, dtype=np.int32)),
        dense_k,
        dense_v,
    )


def bench_fn(fn: Callable, *args, warmup: int = 3, iters: int = 20) -> float:
    """Median wall-clock seconds per call (jit-compiled fn)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def bench_loop(step: Callable, x0, *consts, iters: int = 32,
               base_iters: int = 1, reps: int = 3) -> float:
    """Per-iteration device time of ``x → step(x, *consts)``.

    The loop runs INSIDE one jitted `lax.fori_loop` dispatch with a real
    data dependency (output feeds the next input), so remote-tunnel
    dispatch latency and readback RTT cancel out:
    ``t_kernel = (t(iters) − t(base_iters)) / (iters − base_iters)``.
    This is the TPU/tunnel analog of CUDA-graph timing
    (reference flashinfer/testing/utils.py:1317).

    IMPORTANT: all large arrays must be passed via ``consts`` (explicit jit
    arguments), never closed over — closure constants are embedded in the
    HLO and shipped to the remote compiler (the axon tunnel rejects big
    compile payloads with HTTP 413).
    """
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n, *cs):
        return jax.lax.fori_loop(0, n, lambda i, v: step(v, *cs), x)

    def timed(n: int) -> float:
        best = float("inf")
        for _ in range(reps):
            out = loop(x0, n, *consts)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(jax.numpy.ravel(leaf)[0])  # warm sync
            t0 = time.perf_counter()
            out = loop(x0, n, *consts)
            leaf = jax.tree_util.tree_leaves(out)[0]
            _ = np.asarray(jax.numpy.ravel(leaf)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t_small = timed(base_iters)
    t_big = timed(iters)
    return max((t_big - t_small) / (iters - base_iters), 1e-9)


def bench_chain(fn: Callable, *args, iters: int = 32, warmup: int = 2) -> float:
    """Seconds per call, robust to async-dispatch tunnels (axon).

    `block_until_ready` can return before remote execution completes on
    tunneled backends, so we (a) force completion with a tiny scalar
    device→host readback of a value data-dependent on EVERY iteration,
    and (b) subtract the measured readback/RTT floor (zero-iteration
    baseline). The reference's analogous discipline is CUDA-event timing
    with L2-flush rotation (flashinfer/testing/utils.py:774,937).
    """
    outs = [fn(*args) for _ in range(warmup)]
    leaves = jax.tree_util.tree_leaves(outs[-1])
    _ = np.asarray(jax.tree_util.tree_leaves(outs[-1])[0]).ravel()[0]  # sync

    def run_n(n: int) -> float:
        t0 = time.perf_counter()
        acc = None
        for _ in range(n):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            probe = jax.numpy.ravel(leaf)[:1].astype(jax.numpy.float32)
            acc = probe if acc is None else acc + probe
        if acc is not None:
            _ = np.asarray(acc)  # one scalar readback syncs the whole chain
        else:
            _ = np.asarray(jax.numpy.zeros((1,)))
        return time.perf_counter() - t0

    baseline = run_n(0)
    total = run_n(iters)
    return max((total - baseline) / iters, 1e-9)


def attention_flops(batch, qo_len, kv_len, num_q_heads, head_dim, causal=False):
    """Attention FLOPs (reference: testing/utils.py:456-750 semantics)."""
    if causal:
        # each query row i attends kv_len - qo_len + i + 1 keys
        avg_kv = kv_len - qo_len / 2 + 0.5
    else:
        avg_kv = kv_len
    return 4.0 * batch * qo_len * avg_kv * num_q_heads * head_dim


def attention_bytes(
    batch, qo_len, kv_len, num_q_heads, num_kv_heads, head_dim, q_bytes=2, kv_bytes=2
):
    q = batch * qo_len * num_q_heads * head_dim * q_bytes
    kv = 2 * batch * kv_len * num_kv_heads * head_dim * kv_bytes
    o = batch * qo_len * num_q_heads * head_dim * q_bytes
    return q + kv + o
