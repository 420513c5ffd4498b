"""Serving engine demo + small-batch MoE tests."""

import jax
import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.models.llama import LlamaConfig, init_params
from flashinfer_tpu.ops.moe import fused_moe
from flashinfer_tpu.ops.small_moe import bgmv_moe, monomoe_forward
from flashinfer_tpu.serving import Engine


def test_bgmv_matches_fused():
    rng = np.random.default_rng(0)
    t, h, i_sz, e, k = 4, 32, 64, 8, 2
    x = jnp.asarray(rng.standard_normal((t, h)), jnp.float32)
    w13 = jnp.asarray(rng.standard_normal((e, h, 2 * i_sz)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((e, i_sz, h)) * 0.1, jnp.float32)
    ids = jnp.asarray(rng.integers(0, e, (t, k)), jnp.int32)
    wts = jnp.asarray(rng.random((t, k)), jnp.float32)
    ref = fused_moe(x, w13, w2, ids, wts)
    out = bgmv_moe(x, w13, w2, ids, wts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    out2 = monomoe_forward(x, w13, w2, ids, wts)  # small path
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    out3 = monomoe_forward(x, w13, w2, ids, wts, small_batch_threshold=1)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_engine_generates_and_recycles_pages():
    cfg = LlamaConfig.tiny(num_layers=2)
    params = init_params(jax.random.key(0), cfg)
    eng = Engine(cfg, params, max_batch=4, num_pages=32, page_size=16,
                 max_pages_per_req=4)
    t0 = eng.add_request(0, [1, 2, 3])  # admission prefills + samples
    t1 = eng.add_request(1, [4, 5])
    free_before = len(eng.alloc.free)

    outputs = {0: [t0], 1: [t1]}
    for _ in range(8):
        for rid, tok in eng.step().items():
            outputs[rid].append(tok)
            assert 0 <= tok < cfg.vocab_size
    assert len(outputs[0]) >= 5 and len(outputs[1]) >= 6

    g0 = eng.finish(0)
    g1 = eng.finish(1)
    assert g0 == outputs[0] and g1 == outputs[1]
    assert len(eng.alloc.free) >= free_before  # pages recycled
    assert eng.step() == {}
