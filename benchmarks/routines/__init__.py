"""Benchmark routine registry (reference benchmarks/routines/)."""

from .attention import bench_decode_attention, bench_prefill_attention
from .gemm import bench_mm_bf16, bench_mm_fp8_groupwise
from .moe import bench_fused_moe
from .sampling import bench_top_k_mask_logits, bench_top_k_top_p_sampling

REGISTRY = {
    "decode_attention": bench_decode_attention,
    "prefill_attention": bench_prefill_attention,
    "mm_bf16": bench_mm_bf16,
    "mm_fp8_groupwise": bench_mm_fp8_groupwise,
    "fused_moe": bench_fused_moe,
    "top_k_top_p_sampling": bench_top_k_top_p_sampling,
    "top_k_mask_logits": bench_top_k_mask_logits,
}
