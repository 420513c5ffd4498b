"""DeepSeek-V3-family model: absorbed-MLA decode/prefill over the
combined compressed paged cache vs a dense full-sequence reference."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.models import deepseek as ds


@pytest.fixture(scope="module")
def tiny():
    cfg = ds.DeepseekConfig.tiny(dtype=jnp.float32)
    params = ds.init_params(jax.random.key(0), cfg)
    return cfg, params


def _ref_forward(params, cfg, token_seqs):
    """Dense full-sequence forward [B, S] -> logits [B, S, V], using the
    model's own positionwise helpers with dense absorbed attention in
    place of the paged kernel."""
    b, s = token_seqs.shape
    pos = jnp.broadcast_to(jnp.arange(s), (b, s))
    sm_scale = 1.0 / math.sqrt(cfg.qk_nope_head_dim + cfg.qk_rope_head_dim)
    x = params["embed"][token_seqs].astype(cfg.dtype)
    for l in range(cfg.num_layers):
        lp = params["layers"][l]
        h_in = x
        x = ds.rmsnorm(x, lp["attn_norm"], eps=cfg.rms_eps)
        q_abs, q_pe = ds._q_heads(cfg, lp, x, pos)  # [B,S,H,*]
        row = ds._ckv_row(cfg, lp, x, pos)  # [B,S,dc+pad]
        ckv = row[..., :cfg.kv_lora_rank]
        kpe = row[..., cfg.kv_lora_rank:
                  cfg.kv_lora_rank + cfg.qk_rope_head_dim]
        scores = (
            jnp.einsum("bqhk,bsk->bhqs", q_abs.astype(jnp.float32),
                       ckv.astype(jnp.float32))
            + jnp.einsum("bqhd,bsd->bhqs", q_pe.astype(jnp.float32),
                         kpe.astype(jnp.float32))
        ) * sm_scale
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        o_c = jnp.einsum("bhqs,bsk->bqhk", p,
                         ckv.astype(jnp.float32)).astype(cfg.dtype)
        x = h_in + ds._mla_out(cfg, lp, o_c)
        h_in = x
        x = ds.rmsnorm(x, lp["mlp_norm"], eps=cfg.rms_eps)
        y = ds._moe_mlp(cfg, lp, x.reshape(b * s, -1), l)
        x = h_in + y.reshape(b, s, -1).astype(x.dtype)
    x = ds.rmsnorm(x, params["final_norm"], eps=cfg.rms_eps)
    return (x @ params["lm_head"]).astype(jnp.float32)


def test_prefill_then_decode_matches_dense(tiny):
    """prefill fills the combined cache and decode_step extends it; both
    must match the dense full-sequence reference."""
    cfg, params = tiny
    batch, page_size, pages_per_req = 2, 8, 3
    num_pages = batch * pages_per_req
    lens = [5, 7]  # ragged prompts
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, cfg.vocab_size, n + 1) for n in lens]

    caches = ds.init_kv_cache(cfg, num_pages, page_size)
    page_table = jnp.asarray(
        np.arange(num_pages, dtype=np.int32).reshape(batch, pages_per_req))
    tokens = jnp.asarray(np.concatenate([s[:-1] for s in seqs]), jnp.int32)
    qo_indptr = np.concatenate([[0], np.cumsum(lens)])

    hidden, caches = ds.prefill(
        params, cfg, caches, tokens, qo_indptr, page_table)
    assert hidden.shape == (sum(lens), cfg.hidden_size)

    # decode the next token for both requests
    positions = jnp.asarray(lens, jnp.int32)
    kv_lens = positions + 1
    next_tokens = jnp.asarray([s[-1] for s in seqs], jnp.int32)
    logits, caches2 = ds.decode_step(
        params, cfg, caches, next_tokens, positions, page_table, kv_lens)
    assert logits.shape == (batch, cfg.vocab_size)

    # dense reference over each full sequence
    for b, s in enumerate(seqs):
        ref = _ref_forward(params, cfg, jnp.asarray(s[None], jnp.int32))
        np.testing.assert_allclose(
            np.asarray(logits[b]), np.asarray(ref[0, -1]),
            rtol=2e-2, atol=2e-2)

    # cache row of the decoded token landed in the right page slot
    ps = page_size
    for b, n in enumerate(lens):
        entry = int(page_table[b, n // ps])
        got = np.asarray(caches2[0, entry, n % ps])
        assert np.abs(got).max() > 0


def test_decode_cache_stays_quantized_int8(tiny):
    cfg, params = tiny
    batch, page_size, pages = 2, 8, 4
    caches = ds.init_kv_cache(cfg, pages, page_size, dtype=jnp.int8)
    table = jnp.asarray(
        np.arange(pages, dtype=np.int32).reshape(batch, pages // batch))
    logits, caches2 = ds.decode_step(
        params, cfg, caches, jnp.asarray([1, 2], jnp.int32),
        jnp.zeros(2, jnp.int32), table, jnp.ones(2, jnp.int32))
    assert caches2.dtype == jnp.int8
    assert np.isfinite(np.asarray(logits)).all()
    assert np.abs(np.asarray(caches2)).max() > 0


def test_quantized_experts_route_through_gmm():
    """128-divisible expert dims quantize to int8 blocks and the MoE layer
    still matches the bf16 path."""
    cfg = ds.DeepseekConfig.tiny(
        hidden_size=128, moe_intermediate_size=128,
        dense_intermediate_size=128, kv_lora_rank=128,
        dtype=jnp.float32)
    params = ds.init_params(jax.random.key(1), cfg)
    qparams = ds.quantize_expert_params(params, cfg)
    lp, qlp = params["layers"][-1], qparams["layers"][-1]
    assert qlp["w13"].dtype == jnp.int8 and "w13_scale" in qlp
    x = jax.random.normal(jax.random.key(2), (16, 128), jnp.bfloat16)
    # pin the routing so both paths see identical expert assignments
    # (bf16-vs-f32 router logits can flip a near-tied top-k choice)
    logits = (x @ lp["router"].astype(jnp.bfloat16)).astype(jnp.float32)
    ids, wts = ds.routing_deepseek_v3(
        logits, lp["router_bias"], cfg.top_k, cfg.n_group,
        cfg.topk_group, cfg.routed_scaling_factor)
    y = ds.fused_moe(x, lp["w13"].astype(jnp.bfloat16),
                     lp["w2"].astype(jnp.bfloat16), ids, wts)
    yq = ds.fused_moe(x, qlp["w13"], qlp["w2"], ids, wts,
                      w13_scale=qlp["w13_scale"],
                      w2_scale=qlp["w2_scale"])
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(yq, np.float32),
        rtol=0.1, atol=0.1)


@pytest.mark.parametrize("moe_mode", ["masked", "ep"])
def test_sharded_decode_matches_single(tiny, moe_mode):
    """dp x tp sharded decode (masked-TP and real-EP MoE dispatch) equals
    the single-device step."""
    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = ds.DeepseekConfig.tiny(num_heads=16, dtype=jnp.float32)
    params = ds.init_params(jax.random.key(0), cfg)
    from flashinfer_tpu.parallel import make_mesh

    mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4],
                     axis_order=("dp", "tp"))
    batch, page_size, pages_per_req = 4, 8, 2
    num_pages = batch * pages_per_req
    caches = ds.init_kv_cache(cfg, num_pages, page_size)
    # dp-local page ids (pool shards over dp)
    local_rows = num_pages // 2
    table_np = (np.arange(num_pages, dtype=np.int32)
                % local_rows).reshape(batch, pages_per_req)
    tokens = np.arange(batch, dtype=np.int32) + 3
    positions = np.full(batch, 2, np.int32)
    kv_lens = np.full(batch, 3, np.int32)

    fn, in_specs, _ = ds.make_sharded_decode_fn(cfg, mesh,
                                                moe_mode=moe_mode)
    from jax.sharding import NamedSharding

    sparams = ds.shard_params(params, cfg, mesh, in_specs[0])
    put = lambda x, s: jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, s))
    logits, caches2 = fn(
        sparams, put(caches, in_specs[1]), put(tokens, in_specs[2]),
        put(positions, in_specs[3]), put(table_np, in_specs[4]),
        put(kv_lens, in_specs[5]))
    assert logits.shape == (batch, cfg.vocab_size)

    # single-device reference with GLOBAL page ids
    table_glob = (table_np
                  + (np.arange(batch) // (batch // 2) * local_rows)[:, None])
    ref_logits, _ = ds.decode_step(
        params, cfg, ds.init_kv_cache(cfg, num_pages, page_size),
        jnp.asarray(tokens), jnp.asarray(positions),
        jnp.asarray(table_glob), jnp.asarray(kv_lens))
    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), rtol=2e-2, atol=2e-2)
