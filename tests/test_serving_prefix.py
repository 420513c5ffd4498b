"""Prefix caching in the serving engine: page-granular shared-prefix
reuse (radix chain, refcounts, LRU leaf eviction) and the chunked
prefix-aware admission path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.models.llama import (
    LlamaConfig, init_params, prefill_with_cache, prefill_append_with_cache,
    init_kv_cache,
)
from flashinfer_tpu.serving import Engine, PrefixCache


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    return cfg, params


def test_prefix_append_matches_full_prefill(setup):
    """Admitting [prefix | suffix] in two chunks must equal one full
    prefill (same cache contents, same last-position hidden)."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    ps, n_prefix, n_suffix = 8, 16, 11
    prompt = rng.integers(0, cfg.vocab_size, n_prefix + n_suffix)
    table = jnp.asarray(np.arange(4, dtype=np.int32)[None])

    caches_a = init_kv_cache(cfg, 4, ps, dtype=jnp.float32)
    h_full, caches_a = prefill_with_cache(
        params, cfg, caches_a, jnp.asarray(prompt, jnp.int32),
        np.asarray([0, len(prompt)]), table, kv_scale=1.0)

    caches_b = init_kv_cache(cfg, 4, ps, dtype=jnp.float32)
    _, caches_b = prefill_append_with_cache(
        params, cfg, caches_b, jnp.asarray(prompt[:n_prefix], jnp.int32),
        np.asarray([0, n_prefix]), table, np.asarray([0]), kv_scale=1.0)
    h_app, caches_b = prefill_append_with_cache(
        params, cfg, caches_b, jnp.asarray(prompt[n_prefix:], jnp.int32),
        np.asarray([0, n_suffix]), table, np.asarray([n_prefix]),
        kv_scale=1.0)

    np.testing.assert_allclose(
        np.asarray(caches_b), np.asarray(caches_a), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(h_app[-1]), np.asarray(h_full[-1]), rtol=5e-4,
        atol=5e-4)


def test_engine_prefix_reuse_and_accounting(setup):
    cfg, params = setup
    rng = np.random.default_rng(4)
    ps = 8
    shared = list(rng.integers(0, cfg.vocab_size, 2 * ps))  # 2 full pages
    p1 = shared + list(rng.integers(0, cfg.vocab_size, 5))
    p2 = shared + list(rng.integers(0, cfg.vocab_size, 7))

    eng = Engine(cfg, params, max_batch=4, num_pages=32, page_size=ps,
                 max_pages_per_req=8, prefix_caching=True)
    eng.add_request(1, p1)
    assert eng.prefix_hits == 0  # first request: nothing cached yet
    free_before = len(eng.alloc.free)
    eng.add_request(2, p2)
    assert eng.prefix_hits == 2 * ps  # both shared pages reused
    # request 2 allocated only its private suffix page + decode slot
    assert free_before - len(eng.alloc.free) == 2
    r2 = eng.active[2]
    r1 = eng.active[1]
    assert r2.pages[:2] == r1.pages[:2]  # same physical prefix pages

    for _ in range(3):
        out = eng.step()
        assert set(out) == {1, 2}

    eng.finish(1)
    eng.finish(2)
    # conservation: every page is free, cache-owned, or the null page
    cached = {n.page for n in eng.prefix_cache.nodes.values()}
    assert len(eng.alloc.free) + len(cached) + 1 == 32  # +1 null page
    assert not (set(eng.alloc.free) & cached)
    assert eng.null_page not in cached

    # a third request sharing the prefix still hits after both finished
    p3 = shared + list(rng.integers(0, cfg.vocab_size, 3))
    eng.add_request(3, p3)
    assert eng.prefix_hits == 4 * ps
    eng.finish(3)


def test_engine_prefix_cache_matches_uncached(setup):
    """Same seed + same request sequence: generations are identical with
    and without prefix caching (bf16/f32 cache roundtrip is exact)."""
    cfg, params = setup
    rng = np.random.default_rng(5)
    ps = 8
    shared = list(rng.integers(0, cfg.vocab_size, 2 * ps))
    p1 = shared + list(rng.integers(0, cfg.vocab_size, 4))
    p2 = shared + list(rng.integers(0, cfg.vocab_size, 6))

    outs = []
    for caching in (False, True):
        eng = Engine(cfg, params, max_batch=4, num_pages=32, page_size=ps,
                     max_pages_per_req=8, seed=7, prefix_caching=caching)
        toks = [eng.add_request(1, p1), eng.add_request(2, p2)]
        for _ in range(4):
            step_out = eng.step()
            toks.append((step_out[1], step_out[2]))
        outs.append(toks)
    assert outs[0] == outs[1]


def test_prefix_cache_eviction_lru_leaf_first():
    pc = PrefixCache()
    k1 = pc.insert(None, (1, 2), page=10)
    k2 = pc.insert(k1, (3, 4), page=11)
    pc.insert(None, (9, 9), page=12)
    pc.unref([k1, k2])
    pc.nodes[(None, (9, 9))].refs = 0
    # leaf-first LRU: k2 (leaf, tick 2) goes first; k1 then becomes a
    # leaf and its tick (1) is older than the (9,9) root (tick 3)
    freed = pc.evict(2)
    assert set(freed) == {11, 10}
    assert (None, (9, 9)) in pc.nodes
    assert pc.evict(1) == [12]
