"""TPU sampling fast paths: the row-resident Pallas kernel and the
top-k-compaction fast path, tested against exact numpy set/distribution
semantics (the jnp implementations in ops/sampling.py remain the
reference; reference parity: flashinfer/sampling.py:1341-1428 fast path
+ include/flashinfer/sampling.cuh:1202 rejection kernels).

The Pallas kernel runs in TPU-interpret mode here (host-generated Exp(1)
noise — the interpret PRNG emulation yields zeros); membership is
checked against numpy-exact kept sets, and conditional distributions on
small vocabs against closed-form frequencies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.sampling import (
    _compact_topk_first_sample,
    _compact_topk_sample,
)
from flashinfer_tpu.ops.sampling_pallas import pallas_sample


def _setup(rng, b=8, v=256, scale=3.0):
    logits = jnp.asarray(rng.standard_normal((b, v)) * scale, jnp.float32)
    ln = np.asarray(logits)
    order = np.argsort(-ln, axis=-1)
    probs = np.exp(ln - ln.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return logits, ln, order, probs


def _topk_set(order, ln, b, k):
    kth = ln[b, order[b, k - 1]]
    return set(np.nonzero(ln[b] >= kth)[0].tolist())


def _nucleus(probs, b, p):
    srt = np.argsort(-probs[b])
    c = np.cumsum(probs[b][srt])
    n = int(np.searchsorted(c, p) + 1)
    return set(srt[:n].tolist())


def _topk_first_set(order, probs, b, k, p):
    topset = order[b, :k]
    pk = probs[b, topset]
    pk = pk / pk.sum()
    srt = np.argsort(-pk)
    c = np.cumsum(pk[srt])
    n = int(np.searchsorted(c, p) + 1)
    return set(topset[srt[:n]].tolist())


@pytest.mark.parametrize("k,p", [(5, 0.7), (1, 0.9), (40, 0.5)])
def test_kernel_membership_modes(rng, k, p):
    b = 8
    logits, ln, order, probs = _setup(rng, b=b)
    kk = jnp.full((b,), k, jnp.int32)
    pp = jnp.full((b,), p, jnp.float32)
    for seed in range(6):
        key = jax.random.PRNGKey(seed)
        tok = pallas_sample(logits, key, top_k=kk, mode="topk",
                            interpret=True)
        for i in range(b):
            assert int(tok[i]) in _topk_set(order, ln, i, k)
        tkf = pallas_sample(logits, key, top_k=kk, top_p=pp,
                            mode="topk_first", interpret=True)
        for i in range(b):
            assert int(tkf[i]) in _topk_first_set(order, probs, i, k, p)
        tj = pallas_sample(logits, key, top_k=kk, top_p=pp, mode="joint",
                           interpret=True)
        for i in range(b):
            assert int(tj[i]) in (_nucleus(probs, i, p)
                                  & _topk_set(order, ln, i, k))
        tp_ = pallas_sample(logits, key, top_p=pp, mode="topp",
                            interpret=True)
        for i in range(b):
            ps = probs[i, int(tp_[i])]
            assert probs[i][probs[i] > ps].sum() < p + 1e-5


def test_kernel_minp_and_plain(rng):
    b = 8
    logits, ln, order, probs = _setup(rng, b=b)
    key = jax.random.PRNGKey(3)
    tokm = pallas_sample(logits, key,
                         top_p=jnp.full((b,), 0.3, jnp.float32),
                         mode="minp", interpret=True)
    for i in range(b):
        assert probs[i, int(tokm[i])] >= 0.3 * probs[i].max() - 1e-7
    tok = pallas_sample(logits, key, mode="plain", interpret=True)
    assert tok.shape == (b,) and (np.asarray(tok) >= 0).all()


def test_kernel_probs_input(rng):
    b = 8
    logits, ln, order, probs = _setup(rng, b=b)
    pr = jnp.asarray(probs, jnp.float32)
    kk = jnp.full((b,), 5, jnp.int32)
    for seed in range(4):
        tok = pallas_sample(pr, jax.random.PRNGKey(seed), top_k=kk,
                            mode="topk", input_kind="probs", interpret=True)
        for i in range(b):
            assert int(tok[i]) in _topk_set(order, ln, i, 5)


def test_kernel_plain_distribution(rng):
    lg = jnp.asarray(
        [[np.log(0.5), np.log(0.3), np.log(0.15), np.log(0.05)]],
        jnp.float32)
    counts = np.zeros(4)
    for seed in range(500):
        t = pallas_sample(lg, jax.random.PRNGKey(seed), mode="plain",
                          interpret=True)
        counts[int(t[0])] += 1
    np.testing.assert_allclose(counts / counts.sum(),
                               [0.5, 0.3, 0.15, 0.05], atol=0.06)


def test_kernel_topk_conditional_distribution(rng):
    """top-2 of [0.5, 0.3, 0.15, 0.05]: conditional [0.625, 0.375]."""
    lg = jnp.asarray(
        [[np.log(0.5), np.log(0.3), np.log(0.15), np.log(0.05)]],
        jnp.float32)
    counts = np.zeros(4)
    kk = jnp.full((1,), 2, jnp.int32)
    for seed in range(400):
        t = pallas_sample(lg, jax.random.PRNGKey(seed), top_k=kk,
                          mode="topk", interpret=True)
        counts[int(t[0])] += 1
    freq = counts / counts.sum()
    assert freq[2] == 0 and freq[3] == 0
    np.testing.assert_allclose(freq[:2], [0.625, 0.375], atol=0.07)


@pytest.mark.parametrize("as_array", [False, True])
def test_compact_topk_first_membership(rng, as_array):
    b, v = 8, 9472  # >= fast-path min vocab in spirit; exactness per se
    logits, ln, order, probs = _setup(rng, b=b, v=v, scale=4.0)
    k, p = 12, 0.8
    karg = jnp.full((b,), k, jnp.int32) if as_array else k
    parg = jnp.full((b,), p, jnp.float32) if as_array else p
    for seed in range(8):
        tok = _compact_topk_first_sample(
            logits, karg, parg, jax.random.PRNGKey(seed),
            input_is_logits=True)
        for i in range(b):
            assert int(tok[i]) in _topk_first_set(order, probs, i, k, p)
        tokp = _compact_topk_first_sample(
            jnp.asarray(probs), karg, parg, jax.random.PRNGKey(seed),
            input_is_logits=False)
        for i in range(b):
            assert int(tokp[i]) in _topk_first_set(order, probs, i, k, p)


def test_compact_topk_membership(rng):
    b, v, k = 8, 9472, 7
    logits, ln, order, probs = _setup(rng, b=b, v=v, scale=4.0)
    for seed in range(8):
        tok = _compact_topk_sample(logits, k, jax.random.PRNGKey(seed),
                                   input_is_logits=True)
        for i in range(b):
            assert int(tok[i]) in _topk_set(order, ln, i, k)


def test_compact_topk_first_distribution(rng):
    """Conditional distribution through the compaction path: k=2, p=1
    over [0.5, 0.3, 0.15, 0.05] padded to fast-path width."""
    base = np.full((1, 8192), -40.0, np.float32)
    base[0, :4] = np.log([0.5, 0.3, 0.15, 0.05])
    lg = jnp.asarray(base)
    counts = np.zeros(4)
    for seed in range(400):
        t = _compact_topk_first_sample(lg, 2, 1.0,
                                       jax.random.PRNGKey(seed),
                                       input_is_logits=True)
        counts[int(t[0])] += 1
    freq = counts / counts.sum()
    assert freq[2] == 0 and freq[3] == 0
    np.testing.assert_allclose(freq[:2], [0.625, 0.375], atol=0.07)
