"""Qwen3-Next-style hybrid (GDN + full attention + MoE) model: prefill
and decode vs a dense full-sequence reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.models import qwen_next as qn


@pytest.fixture(scope="module")
def tiny():
    cfg = qn.QwenNextConfig.tiny(dtype=jnp.float32)
    params = qn.init_params(jax.random.key(0), cfg)
    return cfg, params


def _ref_forward(params, cfg, token_seqs):
    """Full-sequence dense forward via prefill with a big page pool
    (prefill's attention path IS dense; GDN path is the scan/chunk op
    that the step path must agree with)."""
    b, s = token_seqs.shape
    page_size = 8
    pages_per_req = (s + page_size - 1) // page_size + 1
    state = qn.init_state(cfg, b, b * pages_per_req, page_size)
    table = jnp.asarray(
        np.arange(b * pages_per_req, dtype=np.int32).reshape(b, -1))
    hidden, _ = qn.prefill(params, cfg, state, token_seqs, table)
    return (hidden @ params["lm_head"]).astype(jnp.float32)


def test_prefill_then_decode_matches_dense(tiny):
    """decode_step continuing from prefill state (conv window + GDN state
    + paged KV) must match the dense forward over the full sequence."""
    cfg, params = tiny
    batch, page_size, t = 2, 8, 6
    pages_per_req = 2
    num_pages = batch * pages_per_req
    rng = np.random.default_rng(0)
    seqs = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (batch, t + 2)), jnp.int32)

    state = qn.init_state(cfg, batch, num_pages, page_size)
    table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, pages_per_req))
    hidden, state = qn.prefill(params, cfg, state, seqs[:, :t], table)
    assert hidden.shape == (batch, t, cfg.hidden_size)

    # two decode steps
    logits = None
    for i in range(2):
        positions = jnp.full((batch,), t + i, jnp.int32)
        logits, state = qn.decode_step(
            params, cfg, state, seqs[:, t + i], positions, table,
            positions + 1)
    ref = _ref_forward(params, cfg, seqs)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref[:, -1]), rtol=2e-2, atol=2e-2)


def test_prefill_hits_chunked_gdn_path(tiny):
    """T=128 rides the chunk-parallel WY delta-rule path; its final state
    must let decode agree with the dense reference."""
    cfg, params = tiny
    batch, page_size, t = 1, 8, 128
    num_pages = (t + page_size) // page_size + 1
    rng = np.random.default_rng(1)
    seqs = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (batch, t + 1)), jnp.int32)
    state = qn.init_state(cfg, batch, num_pages, page_size)
    table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, -1))
    _, state = qn.prefill(params, cfg, state, seqs[:, :t], table)
    positions = jnp.full((batch,), t, jnp.int32)
    logits, _ = qn.decode_step(
        params, cfg, state, seqs[:, t], positions, table, positions + 1)
    ref = _ref_forward(params, cfg, seqs)
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref[:, -1]), rtol=2e-2, atol=2e-2)


def test_state_shapes_and_layer_pattern(tiny):
    cfg, _ = tiny
    assert cfg.num_layers == 4
    assert [cfg.is_full(l) for l in range(4)] == [False, False, False, True]
    st = qn.init_state(cfg, 3, 8, 8)
    assert st["kv"].shape[0] == 1  # one full-attn layer
    assert st["gdn"].shape[:2] == (3, 3)
    assert st["conv"].shape == (3, 3, cfg.conv_kernel - 1, cfg.conv_dim)
