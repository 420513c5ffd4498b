"""Streaming (manual-DMA) decode kernel: interpret-mode coverage on tiny
shapes (the blockspec kernel serves the broad CPU sweeps; this pins the
production TPU path's math)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flashinfer_tpu.ops.attention.pallas_decode import paged_decode_attention
from flashinfer_tpu.testing.utils import attention_ref


@pytest.mark.parametrize("kv_len,page_size", [(48, 16), (20, 16)])
@pytest.mark.parametrize("with_sinks", [False, True])
def test_streaming_matches_blockspec(kv_len, page_size, with_sinks):
    batch, hq, hkv, d = 2, 8, 4, 128
    rng = np.random.default_rng(0)
    pages_per = -(-kv_len // page_size)
    num_pages = batch * pages_per
    k = jnp.asarray(rng.standard_normal((num_pages, page_size, hkv, d)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((num_pages, page_size, hkv, d)),
                    jnp.float32)
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.float32)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per))
    kl = jnp.asarray([kv_len, kv_len - 3], jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(hq), jnp.float32) if with_sinks \
        else None

    o_s, lse_s = paged_decode_attention(
        q, k, v, pt, kl, sinks=sinks, kernel_impl="streaming")
    o_b, lse_b = paged_decode_attention(
        q, k, v, pt, kl, sinks=sinks, kernel_impl="blockspec")
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_b),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(lse_s), np.asarray(lse_b),
                               rtol=2e-4, atol=2e-4)


def test_combined_kv_matches_separate():
    from flashinfer_tpu.ops.attention.pallas_decode import (
        paged_decode_attention_combined,
    )

    batch, hq, hkv, d, ps = 2, 8, 4, 128, 16
    rng = np.random.default_rng(2)
    num_pages = 6
    k = rng.standard_normal((num_pages, ps, hkv, d)).astype(np.float32)
    v = rng.standard_normal((num_pages, ps, hkv, d)).astype(np.float32)
    kv5 = jnp.asarray(np.stack([k, v], axis=1))
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.float32)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(2, 3))
    kl = jnp.asarray([40, 33], jnp.int32)
    o1, l1 = paged_decode_attention(
        q, jnp.asarray(k), jnp.asarray(v), pt, kl, kernel_impl="streaming")
    o2, l2 = paged_decode_attention_combined(q, kv5, pt, kl)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=2e-5, atol=2e-5)


def test_streaming_window_and_softcap():
    batch, hq, hkv, d, page_size = 2, 4, 2, 128, 16
    kv_len = 40
    rng = np.random.default_rng(1)
    pages_per = -(-kv_len // page_size)
    num_pages = batch * pages_per
    k = jnp.asarray(rng.standard_normal((num_pages, page_size, hkv, d)),
                    jnp.float32)
    v = jnp.asarray(rng.standard_normal((num_pages, page_size, hkv, d)),
                    jnp.float32)
    q = jnp.asarray(rng.standard_normal((batch, hq, d)), jnp.float32)
    pt = jnp.asarray(np.arange(num_pages, dtype=np.int32).reshape(
        batch, pages_per))
    kl = jnp.full((batch,), kv_len, jnp.int32)
    kw = dict(window_left=7, logits_soft_cap=15.0)
    o_s, _ = paged_decode_attention(q, k, v, pt, kl, kernel_impl="streaming",
                                    **kw)
    o_b, _ = paged_decode_attention(q, k, v, pt, kl, kernel_impl="blockspec",
                                    **kw)
    np.testing.assert_allclose(np.asarray(o_s), np.asarray(o_b),
                               rtol=2e-4, atol=2e-4)
