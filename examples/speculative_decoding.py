"""Speculative decoding: draft model proposes, target verifies in ONE
multi-token pass over the paged cache, chain sampling accepts a prefix.

Run: python examples/speculative_decoding.py  (FORCE_CPU=1 for interpret)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.models.llama import (
    LlamaConfig, init_kv_cache, init_params,
)
from flashinfer_tpu.speculative import speculative_decode_round

tcfg = LlamaConfig.tiny()
dcfg = LlamaConfig.tiny()
tparams = init_params(jax.random.key(0), tcfg)
dparams = init_params(jax.random.key(1), dcfg)

batch, num_pages, page_size = 2, 16, 16
tcaches = init_kv_cache(tcfg, num_pages, page_size)
dcaches = init_kv_cache(dcfg, num_pages, page_size)
table = jnp.asarray(
    np.arange(num_pages, dtype=np.int32).reshape(batch, -1))

committed = jnp.asarray([3, 7], jnp.int32)
committed_len = jnp.zeros((batch,), jnp.int32)
out, accepted, tcaches, dcaches, draft = speculative_decode_round(
    tparams, tcfg, tcaches, dparams, dcfg, dcaches,
    committed, committed_len, table, num_draft=3,
    key=jax.random.key(42))
print("draft tokens   ", np.asarray(draft))
print("emitted tokens ", np.asarray(out), "(-1 = past acceptance)")
print("accepted/draft ", np.asarray(accepted), "/ 3")
