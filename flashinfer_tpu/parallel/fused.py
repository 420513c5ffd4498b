"""Fused communication + computation (collective matmul).

Capability parity with the reference's fused comm+compute stack:
- ``flashinfer/comm/all_gather_matmul/all_gather_matmul.py:64`` — push-wait
  all-gather matmul (each rank pushes its input chunk to peers; the matmul
  kernel spin-waits per-chunk so compute starts before the gather finishes).
- ``flashinfer/cute_dsl/gemm_allreduce_two_shot.py`` — GEMM with the
  allreduce epilogue overlapped with the mainloop.

TPU redesign: the push-wait signal machinery is a GPU answer to "start
computing on chunk j the moment it lands". On TPU the same overlap is
expressed as a **ring collective matmul** (the "How to Scale Your Model"
recipe): decompose the gather/reduction into ``P-1`` ``ppermute`` steps
over the ICI ring and issue one partial matmul per step. Each step's
``ppermute`` is an *async* collective (HLO ``collective-permute-start/done``
pair); XLA's latency-hiding scheduler hoists the next step's start above
the current step's dot, so the shard-transfer rides ICI concurrently with
MXU work — the spin-wait loop becomes compiler-scheduled dataflow.

Bidirectional variant cuts exposed latency ~2x by streaming half the
shards clockwise and half counter-clockwise (both ICI directions busy).

All functions here are *per-shard* (shard_map) functions: call them inside
``jax.shard_map`` over a mesh axis, like the rest of ``parallel/``.
Outputs assembled from ring hops are replicated in *value* but shard_map's
static varying-manual-axes check cannot prove it — pass
``check_vma=False`` to ``shard_map`` when using replicated ``out_specs``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ring_perms(axis: str, p: int):
    fwd = [(i, (i + 1) % p) for i in range(p)]
    bwd = [(i, (i - 1) % p) for i in range(p)]
    return fwd, bwd


def all_gather_matmul(
    inp: jax.Array,  # [M, K] this rank's shard
    w: jax.Array,  # [K, N] replicated
    axis: str,
    *,
    bidirectional: bool = True,
    return_ag: bool = False,
):
    """Fused all-gather + matmul (reference all_gather_matmul.py:64).

    Computes ``out[i*M:(i+1)*M] = inp_of_rank_i @ w`` for every rank
    ``i`` on the ``axis`` ring — ``out`` is ``[M * P, N]`` replicated,
    like the reference's symmetric-memory output.

    Ring schedule: rank r's own shard is multiplied immediately (step 0
    has zero comm dependency, exactly like the reference's "local chunks
    start immediately"); remote shards arrive one ``ppermute`` hop per
    step and are multiplied as they land. With ``bidirectional`` the
    shards stream both ways around the ring so each direction carries
    ``(P-1)/2`` hops.

    Returns ``out`` ([M*P, N]) or ``(ag, out)`` with ``ag`` the gathered
    ``[M*P, K]`` input if ``return_ag`` (torch symm-mem API shape).
    """
    p = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    m = inp.shape[0]
    fwd_perm, bwd_perm = _ring_perms(axis, p)

    # blocks[j] = shard of rank (idx + j) mod p, filled as they arrive.
    blocks = [None] * p
    blocks[0] = inp
    if bidirectional:
        fwd = inp  # travels rank -> rank+1: carries shard (idx - s)
        bwd = inp  # travels rank -> rank-1: carries shard (idx + s)
        n_fwd = (p - 1 + 1) // 2  # hops in the forward direction
        for s in range(1, p - 1 - n_fwd + 1):
            bwd = jax.lax.ppermute(bwd, axis, perm=bwd_perm)
            blocks[s] = bwd
        for s in range(1, n_fwd + 1):
            fwd = jax.lax.ppermute(fwd, axis, perm=fwd_perm)
            blocks[(p - s) % p] = fwd
    else:
        buf = inp
        for s in range(1, p):
            buf = jax.lax.ppermute(buf, axis, perm=fwd_perm)
            blocks[(p - s) % p] = buf

    # One partial matmul per shard; XLA schedules each dot concurrently
    # with the next hop's collective-permute (independent chains).
    outs = [b @ w for b in blocks]

    # Assemble in *global* rank order: blocks[j] belongs to rank
    # (idx + j) mod p -> rotate into place with a gatherless roll.
    out_rot = jnp.concatenate(outs, axis=0)  # [(idx+0..p-1) blocks]
    out = jnp.roll(out_rot, idx * m, axis=0)
    if not return_ag:
        return out
    ag = jnp.roll(jnp.concatenate(blocks, axis=0), idx * m, axis=0)
    return ag, out


def matmul_reduce_scatter(
    inp: jax.Array,  # [M, K_shard] this rank's K-shard of the activation
    w: jax.Array,  # [K_shard, N] this rank's K-shard of the weight
    axis: str,
) -> jax.Array:
    """Fused matmul + reduce-scatter over rows (two-shot GEMM+AR phase 1).

    Each rank holds a K-shard; the full product ``sum_r inp_r @ w_r``
    ``[M, N]`` is reduce-scattered so rank r ends with rows
    ``[r*M/P : (r+1)*M/P]`` fully summed. The ring-accumulator schedule
    computes ONE ``[M/P, N]`` partial dot per step and overlaps it with
    the in-flight accumulator hop — compute for chunk ``c`` never waits
    on the reduction of chunk ``c-1``.
    """
    p = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    m = inp.shape[0]
    if m % p:
        raise ValueError(f"M={m} not divisible by axis size {p}")
    mc = m // p
    fwd_perm, _ = _ring_perms(axis, p)

    def partial(c):  # this rank's contribution to global chunk c (traced)
        rows = jax.lax.dynamic_slice_in_dim(inp, c * mc, mc, axis=0)
        return rows @ w

    # acc visits ranks i, i+1, ...; rank i adds its partial for the chunk
    # it currently holds: at step s it holds chunk (idx + (p-1) - s) mod p,
    # so after p-1 hops rank i holds its own chunk, fully reduced.
    acc = partial((idx + p - 1) % p)
    for s in range(1, p):
        acc = jax.lax.ppermute(acc, axis, perm=fwd_perm)
        acc = acc + partial((idx + p - 1 - s) % p)
    return acc  # [M/P, N] = rows idx*mc:(idx+1)*mc of the full product


def gemm_allreduce(
    inp: jax.Array,  # [M, K_shard]
    w: jax.Array,  # [K_shard, N]
    axis: str,
    *,
    strategy: str = "two_shot",
) -> jax.Array:
    """GEMM with fused allreduce (reference gemm_allreduce_two_shot.py).

    ``two_shot``: ring matmul+reduce-scatter (overlapped) then all-gather —
    the reference's two-shot decomposition, with phase 1 fused into the
    GEMM mainloop. ``one_shot``: plain dot + ``psum`` (XLA one-shot ring),
    best for small M where per-chunk dots would underfill the MXU.
    Returns the replicated ``[M, N]`` product.
    """
    if strategy == "one_shot":
        return jax.lax.psum(inp @ w, axis)
    if strategy != "two_shot":
        raise ValueError(f"unknown strategy {strategy!r}")
    scattered = matmul_reduce_scatter(inp, w, axis)
    return jax.lax.all_gather(scattered, axis, axis=0, tiled=True)
