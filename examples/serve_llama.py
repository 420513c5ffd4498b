"""Continuous-batching serving with prefix caching.

Two requests share a 32-token system prompt; the second admission hits
the radix prefix cache and skips the shared pages' prefill.

Run: python examples/serve_llama.py   (FORCE_CPU=1 for interpret mode)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from flashinfer_tpu.models.llama import LlamaConfig, init_params
from flashinfer_tpu.serving import Engine

cfg = LlamaConfig.tiny()
params = init_params(jax.random.key(0), cfg)
eng = Engine(cfg, params, max_batch=4, num_pages=64, page_size=16,
             max_pages_per_req=8)

system = list(range(1, 33))  # 2 full pages -> cacheable
t1 = eng.add_request(0, system + [40, 41, 42])
print("req0 first token:", t1, "prefix hits:", eng.prefix_hits)
t2 = eng.add_request(1, system + [50, 51])
print("req1 first token:", t2, "prefix hits:", eng.prefix_hits,
      "(32 = shared system prompt served from cache)")

for step in range(4):
    toks = eng.step()
    print("step", step, "->", toks)
eng.finish(0), eng.finish(1)
print("free pages after finish:", len(eng.alloc.free))
