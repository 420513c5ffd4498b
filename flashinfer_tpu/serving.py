"""Continuous-batching serving loop demo over the flagship model.

The reference is a kernel library consumed by serving engines; this module
demonstrates the intended serving semantics end-to-end (SURVEY §7 step 3
"continuous batching demo"): a page allocator, per-step plan/run decode,
and prefill admission — all with bucket-stable shapes so the jitted step
never retraces as requests come and go.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .models.llama import (
    LlamaConfig, decode_step, init_kv_cache, prefill_with_cache,
)
from .ops.sampling import sampling_from_logits


@dataclass
class PageAllocator:
    """Free-list page allocator (the serving-engine side of the paged-KV
    contract, reference docs/tutorials/kv_layout.rst)."""

    num_pages: int
    page_size: int
    free: list = field(default_factory=list)

    def __post_init__(self):
        self.free = list(range(self.num_pages - 1, -1, -1))

    def alloc(self, n: int) -> list[int]:
        if n > len(self.free):
            raise RuntimeError("out of KV pages")
        return [self.free.pop() for _ in range(n)]

    def release(self, pages: list[int]) -> None:
        self.free.extend(pages)


@dataclass
class Request:
    rid: int
    prompt: list
    generated: list = field(default_factory=list)
    pages: list = field(default_factory=list)
    pos: int = 0  # tokens currently in the KV cache


class Engine:
    """Minimal continuous-batching engine: admit → decode steps → evict.

    Batch shapes are padded to ``max_batch`` and the page table to a fixed
    width, so `decode_step` compiles once for the engine's lifetime.
    """

    def __init__(self, cfg: LlamaConfig, params: dict, *,
                 max_batch: int = 8, num_pages: int = 128,
                 page_size: int = 16, max_pages_per_req: int = 8,
                 seed: int = 0) -> None:
        self.cfg = cfg
        self.params = params
        self.alloc = PageAllocator(num_pages, page_size)
        self.page_size = page_size
        self.max_batch = max_batch
        self.max_pages = max_pages_per_req
        self.caches = init_kv_cache(cfg, num_pages, page_size)
        self.active: dict[int, Request] = {}
        self.key = jax.random.key(seed)

    # -- admission (prefill) -------------------------------------------------
    def add_request(self, rid: int, prompt: list) -> int:
        req = Request(rid, list(prompt))
        n_pages = -(-len(prompt) // self.page_size) or 1
        req.pages = self.alloc.alloc(n_pages + 1)  # +1: first decode slot
        # real admission: one ragged prefill writes the prompt K/V into
        # the owned pages and the last-position logits seed generation
        table = np.zeros((1, self.max_pages), np.int32)
        table[0, :len(req.pages)] = req.pages
        hidden, self.caches = prefill_with_cache(
            self.params, self.cfg, self.caches,
            jnp.asarray(prompt, jnp.int32),
            np.asarray([0, len(prompt)], np.int64), jnp.asarray(table))
        from .models.llama import _mm

        logits = _mm(hidden[-1:], self.params["lm_head"]).astype(
            jnp.float32)
        self.key, sub = jax.random.split(self.key)
        first = int(sampling_from_logits(logits, key=sub)[0])
        req.generated.append(first)
        req.pos = len(prompt)
        self.active[rid] = req
        return first

    def _pad_batch(self):
        reqs = list(self.active.values())[: self.max_batch]
        b = self.max_batch
        tokens = np.zeros(b, np.int32)
        positions = np.zeros(b, np.int32)
        kv_lens = np.zeros(b, np.int32)
        table = np.zeros((b, self.max_pages), np.int32)
        for i, r in enumerate(reqs):
            nxt = (r.prompt + r.generated)[r.pos] if r.pos < len(
                r.prompt + r.generated) else (r.generated or r.prompt)[-1]
            tokens[i] = nxt
            positions[i] = r.pos
            kv_lens[i] = r.pos + 1
            table[i, :len(r.pages)] = r.pages
        return reqs, tokens, positions, table, kv_lens

    # -- one decode step over the live batch ---------------------------------
    def step(self) -> dict[int, int]:
        if not self.active:
            return {}
        reqs, tokens, positions, table, kv_lens = self._pad_batch()
        logits, self.caches = decode_step(
            self.params, self.cfg, self.caches,
            jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(table), jnp.asarray(kv_lens),
        )
        self.key, sub = jax.random.split(self.key)
        sampled = sampling_from_logits(logits, key=sub)
        out = {}
        for i, r in enumerate(reqs):
            r.pos += 1
            # grow pages on demand
            if r.pos >= len(r.pages) * self.page_size:
                if len(r.pages) < self.max_pages:
                    r.pages.extend(self.alloc.alloc(1))
            if r.pos >= len(r.prompt):  # generating
                tok = int(sampled[i])
                r.generated.append(tok)
                out[r.rid] = tok
        return out

    def finish(self, rid: int) -> list:
        req = self.active.pop(rid)
        self.alloc.release(req.pages)
        return req.generated
