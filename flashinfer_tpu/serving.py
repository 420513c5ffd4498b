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
    LlamaConfig, decode_step, init_kv_cache, prefill_append_with_cache,
    prefill_with_cache,
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
class _PrefixNode:
    """One full page of a cached prompt prefix (a radix-tree edge keyed by
    (parent_key, page_tokens))."""

    page: int
    parent: tuple | None
    refs: int = 0  # live requests reading this page
    children: int = 0  # child nodes (only leaves are evictable)
    tick: int = 0  # LRU stamp


class PrefixCache:
    """Page-granular shared-prefix cache (the serving-side consumer of the
    paged-KV sharing contract; reference cascade/shared-prefix docs).

    Full prompt pages are keyed by the CHAIN of page contents from
    position 0, so two prompts share exactly their common page-aligned
    prefix. Pages stay cached (refcounted) after their requests finish and
    are reclaimed leaf-first by LRU when the allocator runs dry."""

    def __init__(self) -> None:
        self.nodes: dict[tuple, _PrefixNode] = {}
        self._tick = 0

    @staticmethod
    def _key(parent: tuple | None, chunk: tuple) -> tuple:
        return (parent, chunk)

    def match(self, prompt: list, page_size: int) -> tuple[list, list]:
        """Longest cached page chain for ``prompt``; returns (pages, keys)
        and bumps refcounts/LRU on the matched nodes. At least the final
        prompt token is always left uncached (its logits seed sampling)."""
        max_tokens = len(prompt) - 1
        pages, keys = [], []
        parent = None
        self._tick += 1
        for i in range(max_tokens // page_size):
            chunk = tuple(prompt[i * page_size:(i + 1) * page_size])
            key = self._key(parent, chunk)
            node = self.nodes.get(key)
            if node is None:
                break
            node.refs += 1
            node.tick = self._tick
            pages.append(node.page)
            keys.append(key)
            parent = key
        return pages, keys

    def insert(self, parent: tuple | None, chunk: tuple, page: int) -> tuple:
        """Register a freshly filled full page; the caller holds one ref."""
        key = self._key(parent, chunk)
        node = self.nodes.get(key)
        if node is not None:  # racing duplicate content: keep existing
            node.refs += 1
            return key
        self._tick += 1
        self.nodes[key] = _PrefixNode(page, parent, refs=1, tick=self._tick)
        if parent is not None and parent in self.nodes:
            self.nodes[parent].children += 1
        return key

    def unref(self, keys: list) -> None:
        for key in keys:
            self.nodes[key].refs -= 1

    def evict(self, n: int) -> list[int]:
        """Free up to ``n`` pages from unreferenced leaves, LRU first."""
        freed: list[int] = []
        while len(freed) < n:
            leaves = [
                (node.tick, key) for key, node in self.nodes.items()
                if node.refs == 0 and node.children == 0
            ]
            if not leaves:
                break
            _, key = min(leaves)
            node = self.nodes.pop(key)
            if node.parent is not None and node.parent in self.nodes:
                self.nodes[node.parent].children -= 1
            freed.append(node.page)
        return freed


@dataclass
class Request:
    rid: int
    prompt: list
    generated: list = field(default_factory=list)
    pages: list = field(default_factory=list)
    pos: int = 0  # tokens currently in the KV cache
    shared_keys: list = field(default_factory=list)  # PrefixCache refs
    own_keys: list = field(default_factory=list)  # pages this req cached
    registered: set = field(default_factory=set)  # pages owned by cache


class Engine:
    """Minimal continuous-batching engine: admit → decode steps → evict.

    Batch shapes are padded to ``max_batch`` and the page table to a fixed
    width, so `decode_step` compiles once for the engine's lifetime.
    """

    def __init__(self, cfg: LlamaConfig, params: dict, *,
                 max_batch: int = 8, num_pages: int = 128,
                 page_size: int = 16, max_pages_per_req: int = 8,
                 seed: int = 0, prefix_caching: bool = True) -> None:
        self.cfg = cfg
        self.params = params
        self.alloc = PageAllocator(num_pages, page_size)
        self.page_size = page_size
        self.max_batch = max_batch
        self.max_pages = max_pages_per_req
        self.caches = init_kv_cache(cfg, num_pages, page_size)
        self.active: dict[int, Request] = {}
        self.key = jax.random.key(seed)
        self.prefix_cache = PrefixCache() if prefix_caching else None
        self.prefix_hits = 0  # tokens served from the prefix cache
        # padded batch rows still run through decode_step, whose per-layer
        # append writes their dummy (token 0, pos 0) row at
        # table[row, 0] slot 0 — park them on a reserved page so they can
        # never corrupt a live request's page 0
        self.null_page = self.alloc.alloc(1)[0]

    def _alloc(self, n: int) -> list[int]:
        """Allocate, evicting cold prefix-cache leaves if the pool is dry."""
        short = n - len(self.alloc.free)
        if short > 0 and self.prefix_cache is not None:
            self.alloc.release(self.prefix_cache.evict(short))
        return self.alloc.alloc(n)

    # -- admission (prefill) -------------------------------------------------
    def add_request(self, rid: int, prompt: list) -> int:
        req = Request(rid, list(prompt))
        ps = self.page_size
        if self.prefix_cache is not None:
            shared_pages, shared_keys = self.prefix_cache.match(prompt, ps)
        else:
            shared_pages, shared_keys = [], []
        req.shared_keys = shared_keys
        prefix_len = len(shared_pages) * ps
        self.prefix_hits += prefix_len
        suffix = prompt[prefix_len:]  # >= 1 token (match leaves the last)
        n_pages = -(-len(prompt) // ps) or 1
        priv = self._alloc(n_pages - len(shared_pages) + 1)  # +1 decode
        req.pages = shared_pages + priv
        table = np.zeros((1, self.max_pages), np.int32)
        table[0, :len(req.pages)] = req.pages
        # prefix-aware admission: the suffix attends the shared prefix
        # pages + itself (chunked-prefill plan) and writes only its own
        # K/V rows; with no prefix this degenerates to a full prefill.
        # NOTE: the call is host-planned per admission (page ids live in
        # the plan); a production engine jits per (suffix, prefix) bucket
        # with the table closed over — see bench_prefix_cache_ttft for
        # the jitted-latency shape of the same call.
        hidden, self.caches = prefill_append_with_cache(
            self.params, self.cfg, self.caches,
            jnp.asarray(suffix, jnp.int32),
            np.asarray([0, len(suffix)], np.int64), jnp.asarray(table),
            np.asarray([prefix_len], np.int64))
        from .models.llama import _mm

        logits = _mm(hidden[-1:], self.params["lm_head"]).astype(
            jnp.float32)
        self.key, sub = jax.random.split(self.key)
        first = int(sampling_from_logits(logits, key=sub)[0])
        req.generated.append(first)
        req.pos = len(prompt)
        # register this prompt's newly filled FULL pages for future reuse
        if self.prefix_cache is not None:
            parent = shared_keys[-1] if shared_keys else None
            for i in range(len(shared_pages), len(prompt) // ps):
                chunk = tuple(prompt[i * ps:(i + 1) * ps])
                key = PrefixCache._key(parent, chunk)
                node = self.prefix_cache.nodes.get(key)
                if node is None:
                    self.prefix_cache.insert(parent, chunk, req.pages[i])
                    req.registered.add(req.pages[i])
                else:  # identical content raced in: keep theirs, ref it
                    node.refs += 1
                req.own_keys.append(key)
                parent = key
        self.active[rid] = req
        return first

    def _pad_batch(self):
        reqs = list(self.active.values())[: self.max_batch]
        b = self.max_batch
        tokens = np.zeros(b, np.int32)
        positions = np.zeros(b, np.int32)
        kv_lens = np.zeros(b, np.int32)
        table = np.full((b, self.max_pages), self.null_page, np.int32)
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
                    r.pages.extend(self._alloc(1))
            if r.pos >= len(r.prompt):  # generating
                tok = int(sampled[i])
                r.generated.append(tok)
                out[r.rid] = tok
        return out

    def finish(self, rid: int) -> list:
        req = self.active.pop(rid)
        if self.prefix_cache is not None:
            self.prefix_cache.unref(req.shared_keys)
            self.prefix_cache.unref(req.own_keys)
        # shared pages belong to the cache; registered pages transferred
        # to it — release only this request's private unregistered pages
        private = [p for p in req.pages[len(req.shared_keys):]
                   if p not in req.registered]
        self.alloc.release(private)
        return req.generated
