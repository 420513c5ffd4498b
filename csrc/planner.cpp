// Native host-side scheduler for flashinfer_tpu.
//
// C++ port of the prefill/decode plan builders (the reference keeps this
// layer native too: DecodePlan/PrefillPlan in
// include/flashinfer/attention/scheduler.cuh:426-920). The plan runs on
// the host every batch reshape, so it must be fast and allocation-light;
// Python falls back to the pure-numpy implementation when this library
// is unavailable (FLASHINFER_TPU_DISABLE_NATIVE=1).
//
// Two-pass C ABI: *_sizes computes output extents, *_fill writes into
// caller-allocated buffers. All integers are int64 to match numpy int64.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

inline int64_t cdiv(int64_t a, int64_t b) { return (a + b - 1) / b; }

inline int64_t next_pow2(int64_t x) {
  int64_t p = 1;
  while (p < x) p <<= 1;
  return p;
}

struct PlanShape {
  int64_t num_works;
  int64_t num_items_padded;
  int64_t tq_pad;
  int64_t tkv_pad;
  int64_t total_q;
};

// Mirrors flashinfer_tpu/ops/attention/pallas_prefill.py build_prefill_plan.
PlanShape compute_shape(const int64_t* qo_indptr, const int64_t* kv_lens,
                        int64_t batch, int64_t tq_tokens, int64_t kv_block,
                        bool causal) {
  int64_t q_rows = 0, kv_rows = 0, works = 0, items = 0;
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t qo_len = qo_indptr[b + 1] - qo_indptr[b];
    const int64_t kv_len = kv_lens[b];
    if (qo_len == 0) continue;
    const int64_t n_tiles = cdiv(qo_len, tq_tokens);
    q_rows += n_tiles * tq_tokens;
    kv_rows += std::max<int64_t>(1, cdiv(kv_len, kv_block)) * kv_block;
    works += n_tiles;
    for (int64_t t = 0; t < n_tiles; ++t) {
      const int64_t q_pos = t * tq_tokens;
      const int64_t tile_end = std::min(q_pos + tq_tokens, qo_len) - 1;
      const int64_t eff =
          causal ? std::min(kv_len, tile_end + kv_len - qo_len + 1) : kv_len;
      items += std::max<int64_t>(1, cdiv(std::max<int64_t>(eff, 1), kv_block));
    }
  }
  // dummy tile for padding items
  works += 1;
  q_rows += tq_tokens;
  if (kv_rows == 0) kv_rows = kv_block;
  const int64_t items_padded = next_pow2(std::max<int64_t>(1, items));
  return {works, items_padded, q_rows, kv_rows, qo_indptr[batch]};
}

}  // namespace

extern "C" {

// out_sizes[5] = {num_works, num_items_padded, tq_pad, tkv_pad, total_q}
int fi_prefill_plan_sizes(const int64_t* qo_indptr, const int64_t* kv_lens,
                          int64_t batch, int64_t tq_tokens, int64_t kv_block,
                          int causal, int64_t* out_sizes) {
  const PlanShape s =
      compute_shape(qo_indptr, kv_lens, batch, tq_tokens, kv_block, causal != 0);
  out_sizes[0] = s.num_works;
  out_sizes[1] = s.num_items_padded;
  out_sizes[2] = s.tq_pad;
  out_sizes[3] = s.tkv_pad;
  out_sizes[4] = s.total_q;
  return 0;
}

// Inputs:
//   qo_indptr[batch+1], kv_lens[batch]
//   paged mode: page_indptr[batch+1] + pages[...] (page_size > 0)
//   ragged mode: kv_row_starts[batch] (page_size == 0)
// Outputs (caller-allocated to the *_sizes extents):
//   item_w/item_c/item_first/item_last [num_items_padded]  (int32)
//   work_q_blk/work_kv_blk/work_kv_len/work_qo_len/work_q_pos [num_works] (i32)
//   q_src [tq_pad] (i64), q_valid [tq_pad] (u8)
//   kv_src [tkv_pad] (i64), kv_valid [tkv_pad] (u8)
//   out_src [total_q] (i64)
//   q_pad_starts/kv_pad_starts [batch] (i64)
int fi_prefill_plan_fill(
    const int64_t* qo_indptr, const int64_t* kv_lens, int64_t batch,
    int64_t group, int64_t tq_tokens, int64_t row_block, int64_t kv_block,
    int causal, int64_t page_size, const int64_t* page_indptr,
    const int64_t* pages, const int64_t* kv_row_starts,
    int32_t* item_w, int32_t* item_c, int32_t* item_first, int32_t* item_last,
    int32_t* work_q_blk, int32_t* work_kv_blk, int32_t* work_kv_len,
    int32_t* work_qo_len, int32_t* work_q_pos, int64_t* q_src,
    uint8_t* q_valid, int64_t* kv_src, uint8_t* kv_valid, int64_t* out_src,
    int64_t* q_pad_starts, int64_t* kv_pad_starts) {
  const PlanShape shape =
      compute_shape(qo_indptr, kv_lens, batch, tq_tokens, kv_block, causal != 0);

  int64_t q_cursor = 0;   // padded token rows emitted
  int64_t kv_cursor = 0;  // padded kv rows emitted
  int64_t w_cursor = 0;   // works emitted
  int64_t i_cursor = 0;   // items emitted

  for (int64_t b = 0; b < batch; ++b) {
    q_pad_starts[b] = q_cursor;
    kv_pad_starts[b] = kv_cursor;
    const int64_t qo_len = qo_indptr[b + 1] - qo_indptr[b];
    const int64_t kv_len = kv_lens[b];
    if (qo_len == 0) continue;

    const int64_t n_tiles = cdiv(qo_len, tq_tokens);
    const int64_t padded_q = n_tiles * tq_tokens;
    for (int64_t r = 0; r < padded_q; ++r) {
      const bool valid = r < qo_len;
      q_src[q_cursor + r] = valid ? (qo_indptr[b] + r) : 0;
      q_valid[q_cursor + r] = valid ? 1 : 0;
    }
    for (int64_t r = 0; r < qo_len; ++r)
      out_src[qo_indptr[b] + r] = q_cursor + r;

    const int64_t n_kv_blocks = std::max<int64_t>(1, cdiv(kv_len, kv_block));
    const int64_t padded_kv = n_kv_blocks * kv_block;
    for (int64_t s = 0; s < padded_kv; ++s) {
      int64_t row;
      if (page_size > 0) {
        const int64_t n_pages = page_indptr[b + 1] - page_indptr[b];
        const int64_t p = std::min(s / page_size, n_pages - 1);
        row = pages[page_indptr[b] + p] * page_size + (s % page_size);
      } else {
        row = kv_row_starts[b] + s;
      }
      const bool valid = s < kv_len;
      kv_src[kv_cursor + s] = valid ? row : 0;
      kv_valid[kv_cursor + s] = valid ? 1 : 0;
    }
    const int64_t kv_blk0 = kv_cursor / kv_block;

    for (int64_t t = 0; t < n_tiles; ++t) {
      const int64_t w = w_cursor;
      const int64_t q_pos = t * tq_tokens;
      const int64_t tile_end = std::min(q_pos + tq_tokens, qo_len) - 1;
      const int64_t eff =
          causal ? std::min(kv_len, tile_end + kv_len - qo_len + 1) : kv_len;
      const int64_t n_chunks =
          std::max<int64_t>(1, cdiv(std::max<int64_t>(eff, 1), kv_block));
      work_q_blk[w] = static_cast<int32_t>(
          (q_cursor / tq_tokens + t) * tq_tokens * group / row_block);
      work_kv_blk[w] = static_cast<int32_t>(kv_blk0);
      work_kv_len[w] = static_cast<int32_t>(kv_len);
      work_qo_len[w] = static_cast<int32_t>(qo_len);
      work_q_pos[w] = static_cast<int32_t>(q_pos);
      ++w_cursor;
      for (int64_t c = 0; c < n_chunks; ++c) {
        item_w[i_cursor] = static_cast<int32_t>(w);
        item_c[i_cursor] = static_cast<int32_t>(c);
        item_first[i_cursor] = c == 0 ? 1 : 0;
        item_last[i_cursor] = c == n_chunks - 1 ? 1 : 0;
        ++i_cursor;
      }
    }
    q_cursor += padded_q;
    kv_cursor += padded_kv;
  }

  // dummy tile absorbing padded items
  const int64_t dummy_w = w_cursor;
  work_q_blk[dummy_w] =
      static_cast<int32_t>(q_cursor * group / row_block);
  work_kv_blk[dummy_w] = 0;
  work_kv_len[dummy_w] = 0;
  work_qo_len[dummy_w] = 1;
  work_q_pos[dummy_w] = 0;
  ++w_cursor;
  for (int64_t r = 0; r < tq_tokens; ++r) {
    q_src[q_cursor + r] = 0;
    q_valid[q_cursor + r] = 0;
  }
  q_cursor += tq_tokens;
  if (kv_cursor == 0) {
    for (int64_t s = 0; s < kv_block; ++s) {
      kv_src[s] = 0;
      kv_valid[s] = 0;
    }
    kv_cursor = kv_block;
  }
  for (int64_t i = i_cursor; i < shape.num_items_padded; ++i) {
    item_w[i] = static_cast<int32_t>(dummy_w);
    item_c[i] = 0;
    item_first[i] = 1;
    item_last[i] = 1;
  }
  return 0;
}

// Dense page table: CSR page lists -> [batch, max_pages] padded with 0
// (reference DecodeSplitKVIndptr upload, scheduler.cuh:449-504).
int fi_build_dense_page_table(const int32_t* kv_indptr,
                              const int32_t* kv_indices, int64_t batch,
                              int64_t max_pages, int32_t* out_table) {
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t n = kv_indptr[b + 1] - kv_indptr[b];
    if (n > max_pages) return -1;
    for (int64_t p = 0; p < n; ++p)
      out_table[b * max_pages + p] = kv_indices[kv_indptr[b] + p];
    for (int64_t p = n; p < max_pages; ++p) out_table[b * max_pages + p] = 0;
  }
  return 0;
}

}  // extern "C"
