"""End-to-end speculative decoding: multi-token verify (decode kernel +
dense block + LSE merge) and the draft→verify→accept round.

These tests compile a large pjit (the 2-layer verify round). XLA:CPU's
JIT deterministically SEGFAULTS compiling it late in a long-lived
full-suite process (backend_compile_and_load; passes standalone), so the
module runs inside a fresh interpreter launched by
tests/test_speculative_subproc.py — directly collecting it in the parent
suite is skipped unless FI_SPEC_SUBPROC=1."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu import speculative as sp
from flashinfer_tpu.models.llama import (
    LlamaConfig, decode_step, init_kv_cache, init_params,
)

# run these tests only in the dedicated subprocess (see module docstring)
pytestmark = pytest.mark.skipif(
    os.environ.get("FI_SPEC_SUBPROC") != "1",
    reason="runs via test_speculative_subproc.py in a fresh interpreter "
           "(XLA:CPU compiler segfault in long-lived suite processes)")


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig.tiny(num_layers=2, dtype=jnp.float32)
    params = init_params(jax.random.key(0), cfg)
    return cfg, params


def _fresh(cfg, batch=2, page_size=8, pages_per_req=3):
    num_pages = batch * pages_per_req
    caches = init_kv_cache(cfg, num_pages, page_size)
    table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, pages_per_req))
    return caches, table


def test_verify_matches_sequential_decode(setup):
    """verify_tokens' n+1 distributions must equal n+1 sequential
    decode_steps over the same tokens (split-KV merge correctness)."""
    cfg, params = setup
    batch, n1 = 2, 3
    caches, table = _fresh(cfg)
    rng = np.random.default_rng(0)

    # seed the cache with 4 committed tokens via sequential decode
    seed_toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 4)),
                            jnp.int32)
    caches_seq = caches
    for i in range(4):
        pos = jnp.full((batch,), i, jnp.int32)
        _, caches_seq = decode_step(
            params, cfg, caches_seq, seed_toks[:, i], pos, table, pos + 1)

    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, n1)),
                       jnp.int32)
    start = jnp.full((batch,), 4, jnp.int32)

    # path A: one verify call
    logits_v, _ = sp.verify_tokens(
        params, cfg, caches_seq, toks, start, table)

    # path B: sequential decode steps (rebuild the same committed cache;
    # fresh pool — the path-A seeding donated the original buffer)
    caches_b, _ = _fresh(cfg)
    for i in range(4):
        pos = jnp.full((batch,), i, jnp.int32)
        _, caches_b = decode_step(
            params, cfg, caches_b, seed_toks[:, i], pos, table, pos + 1)
    seq_logits = []
    for i in range(n1):
        pos = start + i
        lg, caches_b = decode_step(
            params, cfg, caches_b, toks[:, i], pos, table, pos + 1)
        seq_logits.append(lg)
    seq_logits = jnp.stack(seq_logits, axis=1)

    np.testing.assert_allclose(
        np.asarray(logits_v), np.asarray(seq_logits), rtol=2e-2, atol=2e-2)


def test_round_accepts_all_when_draft_is_target(setup):
    """Draft == target ⇒ every draft token is accepted and a bonus token
    is emitted (accept prob = min(1, t/d) = 1)."""
    cfg, params = setup
    batch, n = 2, 3
    t_caches, table = _fresh(cfg)
    d_caches, _ = _fresh(cfg)
    rng = np.random.default_rng(1)

    seed_toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, 3)),
                            jnp.int32)
    for i in range(3):
        pos = jnp.full((batch,), i, jnp.int32)
        _, t_caches = decode_step(
            params, cfg, t_caches, seed_toks[:, i], pos, table, pos + 1)
        _, d_caches = decode_step(
            params, cfg, d_caches, seed_toks[:, i], pos, table, pos + 1)

    committed = jnp.asarray(rng.integers(0, cfg.vocab_size, batch),
                            jnp.int32)
    out, accepted, t_caches, d_caches, draft_toks = (
        sp.speculative_decode_round(
            params, cfg, t_caches, params, cfg, d_caches,
            committed, jnp.full((batch,), 3, jnp.int32), table,
            num_draft=n, key=jax.random.key(7)))
    assert out.shape == (batch, n + 1)
    np.testing.assert_array_equal(np.asarray(accepted), n)
    # the n accepted tokens are the draft tokens themselves
    np.testing.assert_array_equal(
        np.asarray(out[:, :n]), np.asarray(draft_toks))
    assert (np.asarray(out[:, n]) >= 0).all()  # bonus emitted
