"""Tensor-parallel llama decode over a device mesh.

On CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8 FORCE_CPU=1 \
        python examples/sharded_decode.py
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
    LlamaConfig, init_kv_cache, init_params, make_sharded_decode_fn,
    shard_params,
)
from flashinfer_tpu.parallel import make_mesh

n = len(jax.devices())
tp = 2 if n % 2 == 0 else 1
mesh = make_mesh(dp=n // tp, tp=tp)
print("mesh:", dict(mesh.shape))

cfg = LlamaConfig.tiny()
params = init_params(jax.random.key(0), cfg)
batch, num_pages, page_size = 2 * (n // tp), 32, 16
caches = init_kv_cache(cfg, num_pages, page_size)

step, _in_specs, _out_specs = make_sharded_decode_fn(cfg, mesh)
params_s = shard_params(params, cfg, mesh)
table = jnp.asarray(
    np.arange(num_pages, dtype=np.int32).reshape(batch, -1))
tokens = jnp.arange(batch, dtype=jnp.int32) % cfg.vocab_size
positions = jnp.zeros((batch,), jnp.int32)
kv_lens = jnp.ones((batch,), jnp.int32)

logits, caches = step(params_s, caches, tokens, positions, table, kv_lens)
print("logits", logits.shape, "finite:",
      bool(jnp.isfinite(logits.astype(jnp.float32)).all()))
