"""Merge-state algebra + cascade shared-prefix attention correctness."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention import merge
from flashinfer_tpu.ops.attention.cascade import (
    MultiLevelCascadeAttentionWrapper,
    batch_attention_with_shared_prefix_paged_kv_cache,
)
from flashinfer_tpu.testing import attention_ref, make_paged_kv_cache


def _rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape, dtype=np.float32))


def test_merge_state_equals_joint_attention(rng):
    """Splitting KV then merging must equal attention over the full KV."""
    q = _rand(rng, (8, 4, 64))
    k = _rand(rng, (100, 4, 64))
    v = _rand(rng, (100, 4, 64))
    o_full, lse_full = attention_ref(q, k, v, return_lse=True)
    o1, s1 = attention_ref(q, k[:37], v[:37], return_lse=True)
    o2, s2 = attention_ref(q, k[37:], v[37:], return_lse=True)
    o, s = merge.merge_state(o1, s1, o2, s2)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_full), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), np.asarray(lse_full), rtol=1e-4, atol=1e-4)


def test_merge_states_multi(rng):
    q = _rand(rng, (4, 2, 64))
    k = _rand(rng, (90, 2, 64))
    v = _rand(rng, (90, 2, 64))
    o_full, _ = attention_ref(q, k, v, return_lse=True)
    parts = [(0, 30), (30, 60), (60, 90)]
    vs, ss = [], []
    for a, b in parts:
        o, s = attention_ref(q, k[a:b], v[a:b], return_lse=True)
        vs.append(o)
        ss.append(s)
    v_in = jnp.stack(vs, axis=1)  # [seq, n, h, d]
    s_in = jnp.stack(ss, axis=1)
    o, _ = merge.merge_states(v_in, s_in)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_full), rtol=1e-4, atol=1e-4)


def test_merge_associativity(rng):
    v1, v2, v3 = (_rand(rng, (3, 2, 32)) for _ in range(3))
    s1, s2, s3 = (_rand(rng, (3, 2)) for _ in range(3))
    a, sa = merge.merge_state(*merge.merge_state(v1, s1, v2, s2), v3, s3)
    b, sb = merge.merge_state(v1, s1, *merge.merge_state(v2, s2, v3, s3))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sa), np.asarray(sb), rtol=1e-5, atol=1e-5)


def test_variable_length_merge(rng):
    v = _rand(rng, (7, 2, 32))
    s = _rand(rng, (7, 2))
    indptr = jnp.asarray([0, 3, 4, 7], jnp.int32)
    o, lse = merge.variable_length_merge_states(v, s, indptr, max_states=4)
    for i, (a, b) in enumerate([(0, 3), (3, 4), (4, 7)]):
        ref_o, ref_s = merge.merge_states(v[None, a:b], s[None, a:b])
        np.testing.assert_allclose(np.asarray(o[i]), np.asarray(ref_o[0]), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(lse[i]), np.asarray(ref_s[0]), rtol=1e-5, atol=1e-5)


def test_two_level_shared_prefix(rng):
    """shared prefix + unique paged KV == attention over concatenated KV."""
    hq, hkv, d, page_size = 8, 4, 128, 16
    shared_len = 64
    qo_lens = [7, 13]
    unique_lens = [40, 25]
    shared_k = _rand(rng, (shared_len, hkv, d))
    shared_v = _rand(rng, (shared_len, hkv, d))
    (
        k_cache, v_cache, kv_indptr, kv_indices, kv_last_page_len,
        dense_k, dense_v,
    ) = make_paged_kv_cache(rng, unique_lens, page_size, hkv, d, dtype=jnp.float32)
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)
    q = _rand(rng, (int(qo_indptr[-1]), hq, d))
    out = batch_attention_with_shared_prefix_paged_kv_cache(
        q, qo_indptr, shared_k, shared_v, (k_cache, v_cache),
        kv_indptr, kv_indices, kv_last_page_len, page_size, causal=True,
    )
    for b in range(2):
        qs, qe = qo_indptr[b], qo_indptr[b + 1]
        k_full = jnp.concatenate([shared_k, dense_k[b]])
        v_full = jnp.concatenate([shared_v, dense_v[b]])
        # causal over the unique part only == causal over full with the
        # query positioned at the end
        ref = attention_ref(q[qs:qe], k_full, v_full, causal=True)
        np.testing.assert_allclose(
            np.asarray(out[qs:qe]), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


def test_multilevel_wrapper(rng):
    """2-level cascade via the wrapper API with paged KV at both levels."""
    hq, hkv, d, page_size = 4, 4, 128, 16
    shared_len, unique_lens, qo_lens = 48, [32, 16], [5, 9]
    total_q = sum(qo_lens)
    # one page pool holding the shared pages then the unique pages
    all_lens = [shared_len] + unique_lens
    (
        k_cache, v_cache, kv_indptr, kv_indices, kv_last_page_len,
        dense_k, dense_v,
    ) = make_paged_kv_cache(rng, all_lens, page_size, hkv, d, dtype=jnp.float32)
    kv_indptr = np.asarray(kv_indptr)
    kv_indices = np.asarray(kv_indices)
    kv_last = np.asarray(kv_last_page_len)

    # level 0: both requests share entry 0's pages
    shared_pages = kv_indices[kv_indptr[0] : kv_indptr[1]]
    lvl0_indptr = np.asarray([0, len(shared_pages)], np.int32)
    lvl0_qo_indptr = np.asarray([0, total_q], np.int32)
    # level 1: unique pages per request
    lvl1_indptr = np.asarray(
        [0, kv_indptr[2] - kv_indptr[1], kv_indptr[3] - kv_indptr[1]], np.int32
    )
    lvl1_indices = kv_indices[kv_indptr[1] :]
    qo_indptr = np.concatenate([[0], np.cumsum(qo_lens)]).astype(np.int32)

    w = MultiLevelCascadeAttentionWrapper(2)
    w.plan(
        [lvl0_qo_indptr, qo_indptr],
        [lvl0_indptr, lvl1_indptr],
        [shared_pages, lvl1_indices],
        [kv_last[:1], kv_last[1:]],
        hq, hkv, d, page_size,
    )
    q = _rand(rng, (total_q, hq, d))
    out = w.run(q, (k_cache, v_cache))
    for b in range(2):
        qs, qe = qo_indptr[b], qo_indptr[b + 1]
        k_full = jnp.concatenate([dense_k[0], dense_k[b + 1]])
        v_full = jnp.concatenate([dense_v[0], dense_v[b + 1]])
        ref = attention_ref(q[qs:qe], k_full, v_full, causal=True)
        np.testing.assert_allclose(
            np.asarray(out[qs:qe]), np.asarray(ref), rtol=2e-2, atol=2e-2
        )
