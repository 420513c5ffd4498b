"""Sorting-free sampling / renorm / speculative verification.

Capability parity with reference flashinfer/sampling.py:737-1980 (kernels
include/flashinfer/sampling.cuh:736-1672): sampling_from_probs/logits,
top-k / top-p / min-p / joint top-k-top-p sampling, top_p_renorm_probs,
top_k_renorm_probs, top_k_mask_logits, softmax, and
chain_speculative_sampling.

TPU re-design of the "sorting-free" contract: the reference uses dual-pivot
rejection with block scans; the TPU-idiomatic equivalent is a fixed-round
**binary search over the probability threshold** (pure vectorized masked
reductions over vocab — no sort, no data-dependent shapes, scan-free on the
hot path), followed by Gumbel-max categorical sampling. Everything is
deterministic given a `jax.random` key — the functional analog of the
reference's counter-based philox (seed, offset) contract (sampling.py:47),
so sampling is reproducible and jit/replay-safe (SURVEY §2.9).

All functions accept probs of shape [batch, vocab] (or [vocab]) and an
optional `indices` arg for shared-probs batching, matching the reference.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from ..api_logging import flashinfer_api
from ..trace import SAMPLING_TRACE

_NEG_INF = float("-inf")

# TPU fast paths (round 5). Two engines sit under the public API:
#  * sampling_pallas.pallas_sample — the row-resident fused kernel
#    (softmax + noise + threshold search + rejection in one HBM pass);
#  * _compact_topk_first_sample — the reference's top-k-first fast path
#    (sampling.py:1341-1428: radix top-k compaction, then sample among
#    <=256 entries), TPU form: lax.top_k + sorted-cumsum suffix rule.
# The jnp implementations below remain the CPU/interpret reference the
# fast paths are tested against (tests/test_sampling_kernel.py).
_FASTPATH_MAX_K = 256  # reference _TOP_K_FIRST_FAST_PATH_MAX_K
_FASTPATH_MIN_VOCAB = 8192


def _use_tpu_fast() -> bool:
    if os.environ.get("FLASHINFER_TPU_SAMPLING_FASTPATH", "1") in (
            "0", "false", "off"):
        return False
    from ..env import is_tpu_backend

    return is_tpu_backend()


def _compact_topk_first_sample(
    x: jax.Array,  # [B, V] logits or probs
    top_k,  # int or [B] array (array values clamped to _FASTPATH_MAX_K)
    top_p,  # float or [B] array
    key: jax.Array,
    input_is_logits: bool,
) -> jax.Array:
    """top_k_first order via top-k COMPACTION (reference fast path,
    sampling.py:1359): select the top-cap entries once, then renorm +
    top-p + Gumbel sampling on the tiny [B, cap] slab. Exact for every
    row with k <= cap; array top_k rows above the cap are clamped to it
    (the reference refuses array k outright — same 256 cap)."""
    b, v = x.shape
    if isinstance(top_k, int):
        cap = min(top_k, v)
    else:
        cap = min(_FASTPATH_MAX_K, v)
    vals, idx = jax.lax.top_k(x.astype(jnp.float32), cap)  # desc sorted
    pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
    k_arr = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32).reshape(-1, 1),
                             (b, 1))
    p_arr = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32).reshape(-1, 1),
                             (b, 1))
    keep_k = pos < jnp.minimum(k_arr, cap)
    if input_is_logits:
        w = jnp.exp(vals - vals[:, :1])  # unnormalized probs (scale-free)
    else:
        w = jnp.maximum(vals, 0.0)
    wk = jnp.where(keep_k, w, 0.0)
    z1 = jnp.sum(wk, axis=-1, keepdims=True)
    above = jnp.cumsum(wk, axis=-1) - wk  # mass strictly above (sorted)
    keep = jnp.logical_and(keep_k, above < p_arr * z1)
    lw = jnp.where(keep, jnp.log(jnp.maximum(wk, 1e-38)), _NEG_INF)
    g = jax.random.gumbel(key, (b, cap), dtype=jnp.float32)
    j = jnp.argmax(lw + g, axis=-1)
    return jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0].astype(
        jnp.int32)


def _compact_topk_sample(
    x: jax.Array, top_k, key: jax.Array, input_is_logits: bool,
) -> jax.Array:
    """top-k restricted sampling via compaction (k <= 256)."""
    b, v = x.shape
    cap = min(top_k, v) if isinstance(top_k, int) else min(
        _FASTPATH_MAX_K, v)
    vals, idx = jax.lax.top_k(x.astype(jnp.float32), cap)
    pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
    k_arr = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32).reshape(-1, 1),
                             (b, 1))
    keep = pos < jnp.minimum(k_arr, cap)
    if input_is_logits:
        lw = jnp.where(keep, vals - vals[:, :1], _NEG_INF)
    else:
        lw = jnp.where(jnp.logical_and(keep, vals > 0),
                       jnp.log(jnp.maximum(vals, 1e-38)), _NEG_INF)
    g = jax.random.gumbel(key, (b, cap), dtype=jnp.float32)
    j = jnp.argmax(lw + g, axis=-1)
    return jnp.take_along_axis(idx, j[:, None], axis=-1)[:, 0].astype(
        jnp.int32)


def _fastpath_k_ok(top_k, vocab: int) -> bool:
    """Gate for the top-k-COMPACTION fast path — measured NEGATIVE on
    TPU and therefore opt-in only (FLASHINFER_TPU_SAMPLING_COMPACT=1).

    r5 measurement (v5e, b64 x 128256 f32, in a dependent chain):
    ``jax.lax.top_k(x, 256)`` costs **6.4 ms** — XLA lowers TopK on TPU
    through an iterative sort expansion, 60x the whole Pallas sampling
    kernel. (Early probes that read only column 0 of the result measured
    0.07-0.1 ms, but XLA had simplified TopK to a plain max — DCE'd.)
    The reference's radix-select compaction (sampling.py:1359) has no
    cheap XLA analog; the Pallas bisection+rejection kernel fills the
    role instead. Kept because the compacted sampler is exact and the
    right default on any future backend where TopK is fast."""
    if os.environ.get("FLASHINFER_TPU_SAMPLING_COMPACT", "0") not in (
            "1", "true", "on"):
        return False
    if vocab < _FASTPATH_MIN_VOCAB:
        return False
    if isinstance(top_k, int):
        return 0 < top_k <= _FASTPATH_MAX_K
    return True  # array k: clamped to the cap (documented)


def _ensure_2d(x: jax.Array) -> tuple[jax.Array, bool]:
    if x.ndim == 1:
        return x[None], True
    return x, False


def _maybe_gather(probs: jax.Array, indices: jax.Array | None) -> jax.Array:
    """Shared-probs batching: row b uses probs[indices[b]]
    (reference sampling.py `indices` arg)."""
    if indices is None:
        return probs
    return probs[indices]


def softmax(
    logits: jax.Array,
    temperature: float | jax.Array = 1.0,
    enable_pdl: bool | None = None,
) -> jax.Array:
    """Fused temperature softmax (reference sampling.py softmax;
    OnlineSoftmax kernels sampling.cuh:306-508). XLA fuses the online pass."""
    del enable_pdl
    lf = logits.astype(jnp.float32)
    if not (isinstance(temperature, (int, float)) and temperature == 1.0):
        t = jnp.asarray(temperature, jnp.float32)
        if t.ndim == 1:
            t = t[:, None]
        lf = lf / jnp.maximum(t, 1e-10)
    return jax.nn.softmax(lf, axis=-1)


def _gumbel_argmax(key: jax.Array, log_probs: jax.Array) -> jax.Array:
    """Exact categorical sampling via Gumbel-max; -inf rows yield index 0."""
    g = jax.random.gumbel(key, log_probs.shape, dtype=jnp.float32)
    return jnp.argmax(log_probs + g, axis=-1).astype(jnp.int32)


def _threshold_search(
    probs: jax.Array,  # [B, V] f32, assumed >= 0
    keep_fn,  # fn(tau [B,1]) -> bool: does threshold tau keep enough?
    iters: int = 32,
) -> jax.Array:
    """Binary-search the largest tau such that keep_fn(tau) holds.

    keep_fn must be monotone (true for small tau). Returns tau [B, 1].
    This is the sorting-free primitive replacing the reference's dual-pivot
    rejection rounds (sampling.cuh:1202): O(iters) masked reductions, fully
    vectorized on the VPU.
    """
    batch = probs.shape[0]
    lo = jnp.zeros((batch, 1), jnp.float32)
    hi = jnp.max(probs, axis=-1, keepdims=True)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) * 0.5
        ok = keep_fn(mid)  # [B, 1] bool
        lo = jnp.where(ok, mid, lo)
        hi = jnp.where(ok, hi, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


_CHUNK_ROWS = 64  # rows per threshold-search chunk: 64 x 128k f32 = 33 MB
# stays VMEM-resident across the 32 bisection passes; at b256 the whole
# [B, V] operand (131 MB) spills to HBM and the search runs 14x slower
# (measured r4: 13.9 ms vs 4 x 0.95 ms chunked)


def _map_row_chunks(fn, probs: jax.Array, *args):
    """Run ``fn(probs_chunk, *args_chunk)`` over <=_CHUNK_ROWS row groups
    so each group's vocab matrix stays VMEM-resident for the multi-pass
    searches. UNROLLED python loop, not lax.map: the mapped body reads a
    dynamic slice of the big operand, which XLA keeps in HBM (measured
    r4: b256 lax.map 5.2 ms vs ~1.4 ms expected from 4 resident b64
    chunks); unrolled static slices let each sub-search pin its chunk."""
    b = probs.shape[0]
    if b <= _CHUNK_ROWS or b % _CHUNK_ROWS != 0:
        return fn(probs, *args)
    g = b // _CHUNK_ROWS
    outs = []
    for j in range(g):
        sl = slice(j * _CHUNK_ROWS, (j + 1) * _CHUNK_ROWS)
        outs.append(fn(probs[sl], *(a[sl] for a in args)))
    if isinstance(outs[0], tuple):
        return tuple(jnp.concatenate([o[i] for o in outs], axis=0)
                     for i in range(len(outs[0])))
    return jnp.concatenate(outs, axis=0)


def _top_k_threshold(probs: jax.Array, top_k: jax.Array,
                     vals=None) -> jax.Array:
    """tau = the k-th largest probability (exact): {p >= tau} has >= k
    elements (ties included, reference semantics).

    Direct 32-step bisection (the r2 design, restored in r4): each step
    is one masked count over the [B, V] operand, which XLA keeps
    VMEM-resident — the whole b64x128k sampling step measured 0.55 ms
    this way. The r3 "one lax.top_k(4096) candidates pass" replacement
    was never perf-verified and measured 10.3 ms on hardware in r4:
    lax.top_k at large k lowers to an iterative partial sort on TPU.
    """
    del vals
    k_arr = jnp.asarray(top_k, jnp.int32).reshape(-1, 1)

    def chunk(p, k):
        def keep(t):
            return jnp.sum(p >= t, axis=-1, keepdims=True) >= k
        return _threshold_search(p, keep)

    return _map_row_chunks(chunk, probs, k_arr)


def _top_p_threshold(probs: jax.Array, top_p: jax.Array,
                     vals=None) -> jax.Array:
    """Largest tau with mass{p >= tau} >= top_p, by direct bisection
    (see _top_k_threshold for why not a candidates pass)."""
    del vals
    p_arr = jnp.asarray(top_p, jnp.float32).reshape(-1, 1)

    def chunk(pr, p):
        def keep(t):
            mass = jnp.sum(jnp.where(pr >= t, pr, 0.0), axis=-1,
                           keepdims=True)
            return mass >= p
        return _threshold_search(pr, keep)

    return _map_row_chunks(chunk, probs, p_arr)



def _rejection_sample(
    s: jax.Array,  # [B, V] f32 scores; the target dist is softmax(s)|S
    key: jax.Array,
    k_arr: jax.Array | None = None,  # [B, 1] i32 top-k bound (or None)
    p_arr: jax.Array | None = None,  # [B, 1] f32 top-p bound (or None)
    max_rounds: int = 32,
) -> jax.Array:
    """Exact top-k/top-p restricted sampling via Gumbel-order rejection —
    the reference's dual-pivot rejection (sampling.cuh:1202) in batched
    SIMD form.

    The kept set S = {i: count(s > s_i) < k} ∩ {i: mass(p > p_i) < p} is
    a VALUE-THRESHOLD set (a suffix of the score order), so the first
    token of ONE Gumbel-perturbed order that lies in S equals
    argmax_{i∈S}(s_i + g_i): an exact sample from softmax(s)|S — no
    fresh randomness per round is needed. Each round draws the current
    argmax above a per-row value pivot, tests membership with one fused
    count+mass sweep, and on rejection raises the pivot to the
    candidate's score (every token at or below it is provably outside
    S). Typical convergence is 1-4 rounds ≈ ~10 vocab passes total,
    vs 32+ for the bisection searches; rows that somehow exhaust
    ``max_rounds`` fall back to argmax(s), which is always in S.
    """
    b, v = s.shape
    g = jax.random.gumbel(key, (b, v), dtype=jnp.float32)
    neg = jnp.float32(-jnp.inf)
    none_k = k_arr is None
    none_p = p_arr is None
    if none_k:
        k_arr = jnp.zeros((b, 1), jnp.int32)
    if none_p:
        p_arr = jnp.zeros((b, 1), jnp.float32)

    # row-chunked (VMEM residency across while_loop passes, as for the
    # bisection searches); each chunk converges independently
    def chunk(s, g, k_arr, p_arr):
        bc = s.shape[0]
        z = s + g
        if not none_p:
            mx = jnp.max(s, axis=-1, keepdims=True)
            q = jnp.exp(s - mx)  # unnormalized (scale cancels in test)
            zmass = jnp.sum(q, axis=-1, keepdims=True)

        def cond(st):
            i, accepted, token, pivot = st
            return jnp.logical_and(i < max_rounds,
                                   jnp.logical_not(jnp.all(accepted)))

        def body(st):
            i, accepted, token, pivot = st
            zm = jnp.where(s > pivot, z, neg)
            t = jnp.argmax(zm, axis=-1).astype(jnp.int32)  # [Bc]
            s_t = jnp.take_along_axis(s, t[:, None], axis=-1)  # [Bc, 1]
            ok = jnp.ones((bc, 1), bool)
            if not none_k:
                cnt = jnp.sum((s > s_t).astype(jnp.int32), axis=-1,
                              keepdims=True)
                ok = jnp.logical_and(ok, cnt < k_arr)
            if not none_p:
                m_t = jnp.sum(jnp.where(s > s_t, q, 0.0), axis=-1,
                              keepdims=True)
                ok = jnp.logical_and(ok, m_t < p_arr * zmass)
            newly = jnp.logical_and(ok[:, 0], jnp.logical_not(accepted))
            token = jnp.where(newly, t, token)
            accepted = jnp.logical_or(accepted, ok[:, 0])
            pivot = jnp.where(accepted[:, None], pivot, s_t)
            return i + 1, accepted, token, pivot

        token0 = jnp.argmax(s, axis=-1).astype(jnp.int32)
        st = (jnp.int32(0), jnp.zeros((bc,), bool), token0,
              jnp.full((bc, 1), neg, jnp.float32))
        _, _, token, _ = jax.lax.while_loop(cond, body, st)
        return token

    return _map_row_chunks(chunk, s, g, k_arr, p_arr)


def sampling_from_probs(
    probs: jax.Array,
    indices: jax.Array | None = None,
    deterministic: bool = True,  # TPU kernels are always deterministic
    key: jax.Array | None = None,
    check_nan: bool = False,
) -> jax.Array:
    """Categorical sampling from probabilities (reference sampling.py:737)."""
    del deterministic, check_nan
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    if _use_tpu_fast() and probs.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        out = pallas_sample(probs, key, mode="plain", input_kind="probs")
        return out[0] if squeeze else out
    lp = jnp.log(jnp.maximum(probs.astype(jnp.float32), 1e-38))
    lp = jnp.where(probs > 0, lp, _NEG_INF)
    out = _gumbel_argmax(key, lp)
    return out[0] if squeeze else out


def sampling_from_logits(
    logits: jax.Array,
    indices: jax.Array | None = None,
    deterministic: bool = True,
    key: jax.Array | None = None,
    check_nan: bool = False,
    temperature: float | jax.Array = 1.0,
) -> jax.Array:
    """Categorical sampling directly from logits (reference
    sampling.py sampling_from_logits) — fused, no softmax materialization:
    Gumbel-max on (scaled) logits is exactly softmax sampling."""
    del deterministic, check_nan
    logits, squeeze = _ensure_2d(logits)
    logits = _maybe_gather(logits, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    lf = logits.astype(jnp.float32)
    if not (isinstance(temperature, (int, float)) and temperature == 1.0):
        t = jnp.asarray(temperature, jnp.float32)
        if t.ndim == 1:
            t = t[:, None]
        lf = lf / jnp.maximum(t, 1e-10)
    if _use_tpu_fast() and lf.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        out = pallas_sample(lf, key, mode="plain", input_kind="logits")
        return out[0] if squeeze else out
    out = _gumbel_argmax(key, lf)
    return out[0] if squeeze else out


def _masked_sample(probs: jax.Array, mask: jax.Array, key: jax.Array) -> jax.Array:
    p = jnp.where(mask, probs, 0.0)
    lp = jnp.where(p > 0, jnp.log(jnp.maximum(p, 1e-38)), _NEG_INF)
    return _gumbel_argmax(key, lp)


def top_k_sampling_from_probs(
    probs: jax.Array,
    top_k: int | jax.Array,
    indices: jax.Array | None = None,
    deterministic: bool = True,
    key: jax.Array | None = None,
    check_nan: bool = False,
) -> jax.Array:
    """Top-k restricted sampling (reference sampling.py:982-ish)."""
    del deterministic, check_nan
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    pf = probs.astype(jnp.float32)
    if _use_tpu_fast() and _fastpath_k_ok(top_k, pf.shape[-1]):
        out = _compact_topk_sample(pf, top_k, key, input_is_logits=False)
        return out[0] if squeeze else out
    if _use_tpu_fast() and pf.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        k_arr = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32),
                                 (pf.shape[0],))
        out = pallas_sample(pf, key, top_k=k_arr, mode="topk",
                            input_kind="probs")
        return out[0] if squeeze else out
    lp = jnp.where(pf > 0, jnp.log(jnp.maximum(pf, 1e-38)), _NEG_INF)
    k_arr = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32),
                             (pf.shape[0],))[:, None]
    out = _rejection_sample(lp, key, k_arr=k_arr)
    return out[0] if squeeze else out


def top_p_sampling_from_probs(
    probs: jax.Array,
    top_p: float | jax.Array,
    indices: jax.Array | None = None,
    deterministic: bool = True,
    key: jax.Array | None = None,
    check_nan: bool = False,
) -> jax.Array:
    """Nucleus (top-p) sampling (reference sampling.py:1108-ish)."""
    del deterministic, check_nan
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    pf = probs.astype(jnp.float32)
    p_arr = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32),
                             (pf.shape[0],))
    if _use_tpu_fast() and pf.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        out = pallas_sample(pf, key, top_p=p_arr, mode="topp",
                            input_kind="probs")
        return out[0] if squeeze else out
    lp = jnp.where(pf > 0, jnp.log(jnp.maximum(pf, 1e-38)), _NEG_INF)
    out = _rejection_sample(lp, key, p_arr=p_arr[:, None])
    return out[0] if squeeze else out


def min_p_sampling_from_probs(
    probs: jax.Array,
    min_p: float | jax.Array,
    indices: jax.Array | None = None,
    deterministic: bool = True,
    key: jax.Array | None = None,
    check_nan: bool = False,
) -> jax.Array:
    """Min-p sampling: keep tokens with p >= min_p * max(p)
    (reference sampling.py min_p_sampling_from_probs)."""
    del deterministic, check_nan
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    pf = probs.astype(jnp.float32)
    mp = jnp.broadcast_to(jnp.asarray(min_p, jnp.float32), (pf.shape[0],))
    if _use_tpu_fast() and pf.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        out = pallas_sample(pf, key, top_p=mp, mode="minp",
                            input_kind="probs")
        return out[0] if squeeze else out
    tau = mp[:, None] * jnp.max(pf, axis=-1, keepdims=True)
    out = _masked_sample(pf, pf >= tau, key)
    return out[0] if squeeze else out


def top_k_top_p_sampling_from_probs(
    probs: jax.Array,
    top_k: int | jax.Array,
    top_p: float | jax.Array,
    indices: jax.Array | None = None,
    filter_apply_order: str = "top_k_first",
    deterministic: bool = True,
    key: jax.Array | None = None,
    check_nan: bool = False,
) -> jax.Array:
    """Joint top-k + top-p sampling (reference sampling.py:1579)."""
    del deterministic, check_nan
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    pf = probs.astype(jnp.float32)
    batch = pf.shape[0]
    k_arr = jnp.broadcast_to(jnp.asarray(top_k), (batch,))
    p_arr = jnp.broadcast_to(jnp.asarray(top_p), (batch,))
    if filter_apply_order == "top_k_first":
        if _use_tpu_fast() and _fastpath_k_ok(top_k, pf.shape[-1]):
            out = _compact_topk_first_sample(pf, top_k, top_p, key,
                                             input_is_logits=False)
            return out[0] if squeeze else out
        if _use_tpu_fast() and pf.shape[-1] >= 2048:
            from .sampling_pallas import pallas_sample

            out = pallas_sample(
                pf, key, top_k=jnp.asarray(k_arr, jnp.int32),
                top_p=jnp.asarray(p_arr, jnp.float32),
                mode="topk_first", input_kind="probs")
            return out[0] if squeeze else out
        tau_k = _top_k_threshold(pf, k_arr)
        pk = jnp.where(pf >= tau_k, pf, 0.0)
        z = jnp.maximum(jnp.sum(pk, -1, keepdims=True), 1e-38)
        pk = pk / z
        tau_p = _top_p_threshold(pk, p_arr)
        out = _masked_sample(pk, pk >= tau_p, key)
    elif filter_apply_order == "joint":
        if _use_tpu_fast() and pf.shape[-1] >= 2048:
            from .sampling_pallas import pallas_sample

            out = pallas_sample(
                pf, key, top_k=jnp.asarray(k_arr, jnp.int32),
                top_p=jnp.asarray(p_arr, jnp.float32),
                mode="joint", input_kind="probs")
            return out[0] if squeeze else out
        lp = jnp.where(pf > 0, jnp.log(jnp.maximum(pf, 1e-38)), _NEG_INF)
        out = _rejection_sample(
            lp, key,
            k_arr=jnp.asarray(k_arr, jnp.int32).reshape(-1, 1),
            p_arr=jnp.asarray(p_arr, jnp.float32).reshape(-1, 1))
    else:
        raise ValueError(f"bad filter_apply_order {filter_apply_order!r}")
    return out[0] if squeeze else out


@flashinfer_api(trace=SAMPLING_TRACE)
def top_k_top_p_sampling_from_logits(
    logits: jax.Array,
    top_k: int | jax.Array,
    top_p: float | jax.Array,
    indices: jax.Array | None = None,
    filter_apply_order: str = "top_k_first",
    deterministic: bool = True,
    key: jax.Array | None = None,
    check_nan: bool = False,
) -> jax.Array:
    logits2, squeeze = _ensure_2d(logits)
    logits2 = _maybe_gather(logits2, indices)
    if key is None:
        key = jax.random.PRNGKey(0)
    if _use_tpu_fast() and logits2.shape[-1] >= 2048:
        # fused: no host-side softmax materialization (the reference
        # OnlineSoftmax fusion role, sampling.cuh:306-508) — count/mass
        # tests are scale-free in q = exp(l - max(l))
        lf = logits2.astype(jnp.float32)
        b = lf.shape[0]
        if filter_apply_order == "top_k_first":
            if _fastpath_k_ok(top_k, lf.shape[-1]):
                out = _compact_topk_first_sample(lf, top_k, top_p, key,
                                                 input_is_logits=True)
            else:
                from .sampling_pallas import pallas_sample

                out = pallas_sample(
                    lf, key,
                    top_k=jnp.broadcast_to(jnp.asarray(top_k, jnp.int32),
                                           (b,)),
                    top_p=jnp.broadcast_to(jnp.asarray(top_p, jnp.float32),
                                           (b,)),
                    mode="topk_first", input_kind="logits")
        elif filter_apply_order == "joint":
            from .sampling_pallas import pallas_sample

            out = pallas_sample(
                lf, key,
                top_k=jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), (b,)),
                top_p=jnp.broadcast_to(jnp.asarray(top_p, jnp.float32),
                                       (b,)),
                mode="joint", input_kind="logits")
        else:
            raise ValueError(f"bad filter_apply_order {filter_apply_order!r}")
        return out[0] if squeeze else out
    probs = softmax(logits2, 1.0)
    out = top_k_top_p_sampling_from_probs(
        probs, top_k, top_p, None, filter_apply_order,
        deterministic, key, check_nan,
    )
    return out[0] if squeeze else out


def top_p_renorm_probs(
    probs: jax.Array, top_p: float | jax.Array, indices: jax.Array | None = None
) -> jax.Array:
    """Zero out tokens outside the nucleus and renormalize
    (reference sampling.py:1742, sampling.cuh:1672)."""
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    pf = probs.astype(jnp.float32)
    tau = _top_p_threshold(pf, jnp.broadcast_to(jnp.asarray(top_p), (pf.shape[0],)))
    pk = jnp.where(pf >= tau, pf, 0.0)
    pk = pk / jnp.maximum(jnp.sum(pk, -1, keepdims=True), 1e-38)
    pk = pk.astype(probs.dtype)
    return pk[0] if squeeze else pk


def top_k_renorm_probs(
    probs: jax.Array, top_k: int | jax.Array, indices: jax.Array | None = None
) -> jax.Array:
    """Keep top-k tokens and renormalize (reference sampling.py:1831)."""
    probs, squeeze = _ensure_2d(probs)
    probs = _maybe_gather(probs, indices)
    pf = probs.astype(jnp.float32)
    k_arr = jnp.broadcast_to(jnp.asarray(top_k), (pf.shape[0],))
    if _use_tpu_fast() and pf.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        # the kernel's tau_k mode runs the whole threshold search
        # VMEM-resident (the jnp form below is 32 separate HBM sweeps)
        tau = pallas_sample(pf, jax.random.PRNGKey(0),
                            top_k=k_arr.astype(jnp.int32),
                            mode="tau_k", input_kind="probs")[:, None]
    else:
        tau = _top_k_threshold(pf, k_arr)
    pk = jnp.where(pf >= tau, pf, 0.0)
    pk = pk / jnp.maximum(jnp.sum(pk, -1, keepdims=True), 1e-38)
    pk = pk.astype(probs.dtype)
    return pk[0] if squeeze else pk


def top_k_mask_logits(
    logits: jax.Array, top_k: int | jax.Array, indices: jax.Array | None = None
) -> jax.Array:
    """Mask logits outside top-k to -inf (reference sampling.py:1908)."""
    logits, squeeze = _ensure_2d(logits)
    logits = _maybe_gather(logits, indices)
    lf = logits.astype(jnp.float32)
    if isinstance(top_k, int):
        # static k: the k-th largest logit IS the exact threshold — one
        # lax.top_k pass, no search, no underflow
        kth = jax.lax.top_k(lf, top_k)[0][:, -1:]
        out = jnp.where(lf >= kth, lf, _NEG_INF).astype(logits.dtype)
        return out[0] if squeeze else out
    # per-row k: binary-search the threshold IN LOGIT SPACE. Searching on
    # exp(logit - max) underflows to 0.0 for logits < max - 88 and the
    # search cannot separate the underflowed tail (reference kernel
    # sampling.cuh:1202 avoids this by working on logits too).
    k_arr = jnp.asarray(top_k, jnp.int32).reshape(-1, 1)
    k_arr = jnp.broadcast_to(k_arr, (lf.shape[0], 1))
    if _use_tpu_fast() and lf.shape[-1] >= 2048:
        from .sampling_pallas import pallas_sample

        # kernel tau is exp->log round-tripped (q-space search): nudge
        # down by ~4 ulp so the k-th logit itself is never excluded;
        # near-ties within 1e-6 relative may then be kept extra — the
        # same tie-inclusive slack the 32-round bisection has at its
        # interval floor
        tau = pallas_sample(lf, jax.random.PRNGKey(0),
                            top_k=k_arr[:, 0],
                            mode="tau_k", input_kind="logits")[:, None]
        tau = tau - jnp.abs(tau) * 5e-7 - 1e-12
        finite = lf > _NEG_INF
        out = jnp.where(jnp.logical_and(lf >= tau, finite), lf, _NEG_INF)
        return (out[0] if squeeze else out).astype(logits.dtype)
    mx = jnp.max(lf, axis=-1, keepdims=True)
    finite = lf > _NEG_INF
    mn = jnp.min(jnp.where(finite, lf, mx), axis=-1, keepdims=True)
    lo, hi = mn, mx

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) * 0.5
        ok = jnp.sum(lf >= mid, axis=-1, keepdims=True) >= k_arr
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    out = jnp.where(jnp.logical_and(lf >= lo, finite), lf, _NEG_INF)
    return (out[0] if squeeze else out).astype(logits.dtype)


def chain_speculative_sampling(
    draft_probs: jax.Array,  # [B, n, V]
    draft_token_ids: jax.Array,  # [B, n]
    target_probs: jax.Array,  # [B, n+1, V]
    maybe_output_accepted_token_num: jax.Array | None = None,
    maybe_output_emitted_draft_token_num: jax.Array | None = None,
    deterministic: bool = True,
    key: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Chain speculative-decoding verification (reference sampling.py:1980).

    Sequential accept/reject over the n draft tokens: token i is accepted
    with prob min(1, target_i[tok]/draft_i[tok]); on first rejection a
    replacement is drawn from the residual max(target-draft, 0) and the
    chain stops. If all n accepted, a bonus token is drawn from
    target_probs[:, n]. Returns (output_token_ids [B, n+1] with -1 padding,
    accepted_count [B], emitted_count [B]); counts accumulate onto the
    maybe_output_* arrays when given (reference semantics).
    """
    del deterministic
    if key is None:
        key = jax.random.PRNGKey(0)
    batch, n, vocab = draft_probs.shape
    dp = draft_probs.astype(jnp.float32)
    tp = target_probs.astype(jnp.float32)

    u_key, res_key, bonus_key = jax.random.split(key, 3)
    u = jax.random.uniform(u_key, (batch, n), dtype=jnp.float32)
    res_keys = jax.random.split(res_key, n)

    def step(carry, i):
        alive = carry  # [B] bool: chain not yet rejected
        tok = draft_token_ids[:, i]
        p_draft = jnp.take_along_axis(dp[:, i], tok[:, None], axis=-1)[:, 0]
        p_target = jnp.take_along_axis(tp[:, i], tok[:, None], axis=-1)[:, 0]
        ratio = p_target / jnp.maximum(p_draft, 1e-38)
        accept = jnp.logical_and(alive, u[:, i] < jnp.minimum(ratio, 1.0))
        # residual sample where rejected this step
        resid = jnp.maximum(tp[:, i] - dp[:, i], 0.0)
        resid_sum = jnp.sum(resid, -1, keepdims=True)
        # fall back to target when residual is all-zero (identical dists)
        resid = jnp.where(resid_sum > 0, resid, tp[:, i])
        lp = jnp.where(resid > 0, jnp.log(jnp.maximum(resid, 1e-38)), _NEG_INF)
        rtok = _gumbel_argmax(res_keys[i], lp)
        rejected_now = jnp.logical_and(alive, jnp.logical_not(accept))
        out_tok = jnp.where(
            accept, tok, jnp.where(rejected_now, rtok, -1)
        ).astype(jnp.int32)
        return jnp.logical_and(alive, accept), (out_tok, accept, rejected_now)

    alive, (toks, accepts, rejects) = jax.lax.scan(
        step, jnp.ones((batch,), bool), jnp.arange(n)
    )
    toks = toks.T  # [B, n]
    accepted = jnp.sum(accepts.T, axis=-1).astype(jnp.int32)
    # emitted = accepted draft tokens; +1 replacement or bonus token always emitted
    bonus_lp = jnp.where(
        tp[:, n] > 0, jnp.log(jnp.maximum(tp[:, n], 1e-38)), _NEG_INF
    )
    bonus = _gumbel_argmax(bonus_key, bonus_lp)
    bonus_col = jnp.where(alive, bonus, -1).astype(jnp.int32)[:, None]
    output_token_ids = jnp.concatenate([toks, bonus_col], axis=-1)

    emitted = accepted  # reference: emitted draft tokens == accepted ones
    if maybe_output_accepted_token_num is not None:
        accepted_out = maybe_output_accepted_token_num + accepted
    else:
        accepted_out = accepted
    if maybe_output_emitted_draft_token_num is not None:
        emitted_out = maybe_output_emitted_draft_token_num + emitted
    else:
        emitted_out = emitted
    return output_token_ids, accepted_out, emitted_out
