"""Sampling family: distribution checks + constraint satisfaction.

Mirrors reference tests/utils/test_sampling.py strategy: verify samples
always satisfy the top-k/top-p/min-p constraint and empirical frequencies
approach the renormalized distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops import sampling


def _rand_probs(rng, batch, vocab, zipf=True):
    if zipf:
        p = 1.0 / (1.0 + rng.permuted(np.tile(np.arange(vocab), (batch, 1)), axis=1))
    else:
        p = rng.random((batch, vocab))
    p = p / p.sum(-1, keepdims=True)
    return jnp.asarray(p, jnp.float32)


def test_sampling_from_probs_distribution(rng):
    probs = jnp.asarray([[0.5, 0.3, 0.2, 0.0]], jnp.float32)
    counts = np.zeros(4)
    keys = jax.random.split(jax.random.PRNGKey(0), 300)
    samp = jax.jit(sampling.sampling_from_probs, static_argnames=())
    for k in keys:
        s = sampling.sampling_from_probs(probs, key=k)
        counts[int(s[0])] += 1
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, [0.5, 0.3, 0.2, 0.0], atol=0.08)


def test_sampling_from_logits_matches_softmax(rng):
    logits = jnp.asarray(rng.standard_normal((2, 64)), jnp.float32)
    # same key must give same result via probs path and logits path
    k = jax.random.PRNGKey(7)
    s1 = sampling.sampling_from_logits(logits, key=k)
    s2 = sampling.sampling_from_probs(sampling.softmax(logits), key=k)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


@pytest.mark.parametrize("k", [1, 5, 17])
def test_top_k_constraint(rng, k):
    probs = _rand_probs(rng, 4, 111)
    order = np.argsort(-np.asarray(probs), axis=-1)
    topk_sets = [set(order[b, :k].tolist()) for b in range(4)]
    for seed in range(20):
        s = sampling.top_k_sampling_from_probs(
            probs, k, key=jax.random.PRNGKey(seed)
        )
        for b in range(4):
            assert int(s[b]) in topk_sets[b], (k, b, int(s[b]))


@pytest.mark.parametrize("p", [0.1, 0.5, 0.9])
def test_top_p_constraint(rng, p):
    probs = _rand_probs(rng, 4, 111)
    pn = np.asarray(probs)
    for seed in range(20):
        s = sampling.top_p_sampling_from_probs(
            probs, p, key=jax.random.PRNGKey(seed)
        )
        for b in range(4):
            # sampled token must be in the smallest top-p set: all tokens
            # with prob > prob[sampled] plus sampled must have mass <= ~p
            ps = pn[b, int(s[b])]
            mass_above = pn[b][pn[b] > ps].sum()
            assert mass_above < p + 1e-5


def test_min_p_constraint(rng):
    probs = _rand_probs(rng, 4, 64)
    pn = np.asarray(probs)
    for seed in range(20):
        s = sampling.min_p_sampling_from_probs(
            probs, 0.3, key=jax.random.PRNGKey(seed)
        )
        for b in range(4):
            assert pn[b, int(s[b])] >= 0.3 * pn[b].max() - 1e-7


def test_top_k_renorm(rng):
    probs = _rand_probs(rng, 3, 50)
    out = np.asarray(sampling.top_k_renorm_probs(probs, 10))
    pn = np.asarray(probs)
    for b in range(3):
        top = np.argsort(-pn[b])[:10]
        ref = np.zeros(50)
        ref[top] = pn[b, top] / pn[b, top].sum()
        np.testing.assert_allclose(out[b], ref, rtol=1e-4, atol=1e-6)


def test_top_p_renorm(rng):
    probs = _rand_probs(rng, 3, 50)
    top_p = 0.6
    out = np.asarray(sampling.top_p_renorm_probs(probs, top_p))
    pn = np.asarray(probs)
    for b in range(3):
        order = np.argsort(-pn[b])
        csum = np.cumsum(pn[b, order])
        keep_n = int(np.searchsorted(csum, top_p) + 1)
        keep = order[:keep_n]
        ref = np.zeros(50)
        ref[keep] = pn[b, keep] / pn[b, keep].sum()
        np.testing.assert_allclose(out[b], ref, rtol=1e-3, atol=1e-5)


def test_top_k_mask_logits(rng):
    logits = jnp.asarray(rng.standard_normal((2, 40)), jnp.float32)
    out = np.asarray(sampling.top_k_mask_logits(logits, 8))
    ln = np.asarray(logits)
    for b in range(2):
        top = set(np.argsort(-ln[b])[:8].tolist())
        for v in range(40):
            if v in top:
                assert out[b, v] == ln[b, v]
            else:
                assert np.isneginf(out[b, v])


def test_chain_speculative_sampling_accept_all(rng):
    # draft == target -> all tokens accepted, bonus emitted
    batch, n, vocab = 2, 3, 16
    p = _rand_probs(rng, batch * n, vocab).reshape(batch, n, vocab)
    tp = jnp.concatenate([p, _rand_probs(rng, batch, vocab)[:, None]], axis=1)
    # draft tokens = argmax ensures ratio = 1 -> accept
    toks = jnp.argmax(p, -1).astype(jnp.int32)
    out, acc, emit = sampling.chain_speculative_sampling(
        p, toks, tp, key=jax.random.PRNGKey(0)
    )
    assert out.shape == (batch, n + 1)
    np.testing.assert_array_equal(np.asarray(acc), [n, n])
    assert (np.asarray(out[:, :n]) == np.asarray(toks)).all()
    assert (np.asarray(out[:, n]) >= 0).all()


def test_chain_speculative_sampling_reject_first(rng):
    # target prob of drafted token is 0 -> rejected at step 0
    batch, n, vocab = 1, 2, 8
    dp = np.full((batch, n, vocab), 1.0 / vocab, np.float32)
    toks = np.array([[3, 4]], np.int32)
    tp = np.full((batch, n + 1, vocab), 1.0 / vocab, np.float32)
    tp[0, 0, 3] = 0.0
    tp[0, 0] /= tp[0, 0].sum()
    out, acc, emit = sampling.chain_speculative_sampling(
        jnp.asarray(dp), jnp.asarray(toks), jnp.asarray(tp),
        key=jax.random.PRNGKey(1),
    )
    o = np.asarray(out)
    assert int(acc[0]) == 0
    assert o[0, 0] != 3 and o[0, 0] >= 0  # replacement from residual
    assert o[0, 1] == -1 and o[0, 2] == -1  # chain stopped


def test_rejection_sampler_conditional_distribution(rng):
    """The Gumbel-order rejection sampler must draw from the RENORMALIZED
    restricted distribution, not merely land inside the set: top-2 of
    [0.5, 0.3, 0.15, 0.05] is {0, 1} with conditional [0.625, 0.375]."""
    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]], jnp.float32)
    counts = np.zeros(4)
    for seed in range(400):
        s = sampling.top_k_sampling_from_probs(
            probs, 2, key=jax.random.PRNGKey(seed))
        counts[int(s[0])] += 1
    freq = counts / counts.sum()
    assert freq[2] == 0 and freq[3] == 0
    np.testing.assert_allclose(freq[:2], [0.625, 0.375], atol=0.07)


def test_rejection_sampler_top_p_distribution(rng):
    """top-p nucleus conditional: p=0.6 over [0.5, 0.3, 0.2] keeps
    {0, 1} (mass-above test: 0.5 < 0.6 for token 1; 0.8 >= 0.6 kills
    token 2), conditional [0.625, 0.375]."""
    probs = jnp.asarray([[0.5, 0.3, 0.2]], jnp.float32)
    counts = np.zeros(3)
    for seed in range(400):
        s = sampling.top_p_sampling_from_probs(
            probs, 0.6, key=jax.random.PRNGKey(seed))
        counts[int(s[0])] += 1
    freq = counts / counts.sum()
    assert freq[2] == 0
    np.testing.assert_allclose(freq[:2], [0.625, 0.375], atol=0.07)
