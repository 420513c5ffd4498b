"""flashinfer-tpu: TPU-native LLM inference kernel engine.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
FlashInfer (reference: flashinfer/__init__.py:25-247): paged/ragged KV-cache
attention (decode, prefill, cascade, MLA, sparse), quantized GEMM/grouped-GEMM
(FP8 groupwise, FP4), fused MoE with routing, sorting-free sampling/top-k,
fused RoPE/norm/activation ops, and mesh-parallel serving primitives.
"""

from .version import __version__  # noqa: F401

# Point XLA's persistent compilation cache at the package cache dir on
# import (reference analog: the prebuilt jit-cache wheel, jit/core.py:360).
# Saves the 20-40 s first-compile on every process; opt out with
# FLASHINFER_TPU_NO_PERSISTENT_CACHE=1.
import os as _os

if not _os.environ.get("FLASHINFER_TPU_NO_PERSISTENT_CACHE"):
    try:
        from .aot import enable_persistent_cache as _epc

        _epc()
    except Exception:
        pass

from .utils import (  # noqa: F401
    KVLayout,
    MaskMode,
    PosEncodingMode,
    merge_attention_states,
)
from .page import (  # noqa: F401
    append_paged_kv_cache,
    get_batch_indices_positions,
    get_seq_lens,
)
from .ops.attention.decode import (  # noqa: F401
    BatchDecodeWithPagedKVCacheWrapper,
    CUDAGraphBatchDecodeWithPagedKVCacheWrapper,
    recommended_page_size,
    single_decode_with_kv_cache,
)
from .ops.attention.prefill import (  # noqa: F401
    BatchPrefillWithPagedKVCacheWrapper,
    BatchPrefillWithRaggedKVCacheWrapper,
    single_prefill_with_kv_cache,
)
from .ops.attention.merge import (  # noqa: F401
    merge_state,
    merge_state_in_place,
    merge_states,
    variable_length_merge_states,
)
from .ops.attention.cascade import (  # noqa: F401
    MultiLevelCascadeAttentionWrapper,
)
from .ops.attention.mla import (  # noqa: F401
    BatchMLAPagedAttentionWrapper,
)
from .ops.attention.sparse import (  # noqa: F401
    BlockSparseAttentionWrapper,
    VariableBlockSparseAttentionWrapper,
)
from .ops.attention.variants import (  # noqa: F401
    AttentionVariant,
    DefaultAttention,
    VariantInfo,
)
from .ops.gmm import (  # noqa: F401
    fused_moe_quant,
    grouped_matmul_quant,
)
from .parallel.ep import (  # noqa: F401
    MoEEpLayer,
    MoEEpRankEvictedError,
)
from .ops.attention.holistic import (  # noqa: F401
    BatchAttention,
    BatchAttentionWithAttentionSinkWrapper,
    BatchPODWithPagedKVCacheWrapper,
    PODWithPagedKVCacheWrapper,
)
from .ops.topk import (  # noqa: F401
    TopKTieBreak,
    top_k,
    top_k_page_table_transform,
    top_k_ragged_transform,
    topk_varlen,
)
from .ops.ssm import (  # noqa: F401
    checkpointing_ssu,
    chunk_gated_delta_rule,
    gdn_decode,
    recurrent_kda,
    selective_state_update,
)
from .ops.concat_ops import (  # noqa: F401
    concat_mla_absorb_q,
    concat_mla_k,
)
from .ops.sampling import (  # noqa: F401
    chain_speculative_sampling,
    min_p_sampling_from_probs,
    sampling_from_logits,
    sampling_from_probs,
    softmax,
    top_k_mask_logits,
    top_k_renorm_probs,
    top_k_sampling_from_probs,
    top_k_top_p_sampling_from_logits,
    top_k_top_p_sampling_from_probs,
    top_p_renorm_probs,
    top_p_sampling_from_probs,
)
from .ops.rope import (  # noqa: F401
    apply_llama31_rope,
    apply_llama31_rope_inplace,
    apply_llama31_rope_pos_ids,
    apply_llama31_rope_pos_ids_inplace,
    apply_rope,
    apply_rope_inplace,
    apply_rope_pos_ids,
    apply_rope_pos_ids_inplace,
    apply_rope_with_cos_sin_cache,
    apply_rope_with_cos_sin_cache_inplace,
)
from .ops.norm import (  # noqa: F401
    fused_add_rmsnorm,
    gemma_fused_add_rmsnorm,
    gemma_rmsnorm,
    layernorm,
    rmsnorm,
)
from .ops.activation import (  # noqa: F401
    gelu_and_mul,
    gelu_tanh_and_mul,
    silu_and_mul,
)
from .parallel import (  # noqa: F401
    Mapping,
    UlyssesCommunicator,
    allreduce_fusion,
    make_mesh,
    moe_ep_forward,
    ring_attention,
)
from .ops.gemm import (  # noqa: F401
    SegmentGEMMWrapper,
    bmm_bf16,
    bmm_fp8,
    grouped_mm_bf16,
    grouped_mm_fp4,
    grouped_mm_fp8,
    grouped_mm_mxfp8,
    mm_bf16,
    mm_fp4,
    mm_fp8,
    mm_mxfp8,
)
from .ops.moe import (  # noqa: F401
    cutlass_fused_moe,
    fused_moe,
    trtllm_bf16_moe,
    trtllm_fp8_block_scale_moe,
    trtllm_fp8_per_tensor_scale_moe,
)
from .ops.routing import RoutingMethodType, apply_routing  # noqa: F401
from .ops.quantization import (  # noqa: F401
    fp4_quantize,
    fp8_quantize,
    mxfp4_dequantize,
    mxfp4_quantize,
    mxfp8_dequantize,
    mxfp8_quantize,
    nvfp4_quantize,
    packbits,
    segment_packbits,
)
from .ops.attention.api_compat import (  # noqa: F401
    cudnn_batch_decode_with_kv_cache,
    fast_decode_plan,
    fmha_varlen,
    trtllm_batch_decode_with_kv_cache,
    xqa,
    xqa_batch_decode_with_kv_cache,
)
from .autotuner import AutoTuner, TunableRunner, autotune  # noqa: F401
from .api_logging import flashinfer_api  # noqa: F401
from .ops.compat_ops import (  # noqa: F401
    fused_add_rmsnorm_quant,
    fused_dit_gate_residual_layernorm_gamma_beta,
    fused_dit_gate_residual_layernorm_scale_shift,
    fused_dit_residual_layernorm_scale_shift,
    fused_kda_decode,
    get_fp4_quantization_module,
    is_gated_activation,
    layernorm_quant,
    mm_bf16_fp4,
    mm_nvfp4_svdquant,
    mxfp4_dequantize_host,
    mxfp8_dequantize_host,
    mxfp8_grouped_quantize,
    next_positive_power_of_2,
    nvfp4_attention_sm120_fwd,
    nvfp4_attention_sm120_quantize_qkv,
    nvfp4_batched_quantize,
    nvfp4_kv_dequantize,
    nvfp4_kv_dequantize_paged,
    nvfp4_kv_quantize,
    nvfp4_quantize_append_paged_kv_cache,
    nvfp4_quantize_append_paged_kv_cache_with_slot_mapping,
    nvfp4_quantize_paged_kv_cache,
    nvfp4_quantize_smooth,
    prepare_bf16_fp4_weights,
    prepare_low_latency_gemm_weights,
    reorder_rows_for_gated_act_gemm,
    rmsnorm_fp4quant,
    rmsnorm_quant,
    silu_and_mul_nvfp4_quantize,
    silu_and_mul_scaled_nvfp4_experts_quantize,
    single_prefill_with_kv_cache_return_lse,
    svdquant_linear,
    tgv_gemm_sm100,
    top_k_varlen,
    trtllm_fmha_v2_prefill,
    trtllm_fp4_block_scale_routed_moe,
    trtllm_fp8_block_scale_routed_moe,
    trtllm_fp8_per_tensor_scale_routed_moe,
    trtllm_sage_attention_quantize,
)
from .ops.quantization import (  # noqa: F401
    block_scale_interleave,
    fp4_dequantize,
    nvfp4_block_scale_interleave,
    scaled_fp4_grouped_quantize,
    shuffle_matrix_a,
    shuffle_matrix_sf_a,
)
from .ops.moe import (  # noqa: F401
    trtllm_bf16_routed_moe,
    trtllm_fp4_block_scale_moe,
    trtllm_mxint4_moe,
)
from .ops.small_moe import bgmv_moe, monomoe_forward  # noqa: F401
from .ops.deep_gemm import (  # noqa: F401
    fp8_gemm_nt,
    m_grouped_fp8_gemm_nt_contiguous,
    m_grouped_fp8_gemm_nt_masked,
)
from .ops.msa import (  # noqa: F401
    msa_proxy_score,
    msa_proxy_score_fp4,
    msa_quantize_qk_fp4,
    msa_sparse_attention,
    msa_sparse_decode_attention,
    msa_topk_select,
)
from .ops.mhc import mhc_post, mhc_pre_big_fuse  # noqa: F401
from .ops.moe_api import MoEConfig, QuantVariant, create_moe  # noqa: F401
from .ops.attention.mla import (  # noqa: F401
    BatchDecodeMlaWithPagedKVCacheWrapper,
    sparse_mla_attention,
    trtllm_batch_decode_sparse_mla_dsv4,
    trtllm_batch_decode_with_kv_cache_mla,
    xqa_mla,
)
from .ops.rope import (  # noqa: F401
    mla_rope_quantize_fp8,
    rope_quantize_fp8,
    rope_quantize_fp8_append_paged_kv_cache,
)
from .ops.norm import (  # noqa: F401
    fused_qk_rmsnorm_rope,
    fused_rmsnorm_silu,
    layernorm_scale_shift,
    rmsnorm_fp8_quant,
)
from .ops.activation import silu_and_mul_fp8_quant  # noqa: F401
from .page import (  # noqa: F401
    block_sparse_indices_to_vector_sparse_offsets,
)
from . import fi_trace  # noqa: F401
from .ops.moe_api import ActivationType  # noqa: F401
from .ops.quantization import SfLayout, e2m1_and_ufp8sf_scale_to_float  # noqa: F401
from .ops.gemm import bmm_mxfp8  # noqa: F401
from .page import append_paged_mla_kv_cache  # noqa: F401
from .ops.attention.cascade import (  # noqa: F401
    BatchDecodeWithSharedPrefixPagedKVCacheWrapper,
    BatchPrefillWithSharedPrefixPagedKVCacheWrapper,
)
from .ops.compat_ops import (  # noqa: F401
    B12xMoEWrapper,
    CuteDslMoEWrapper,
    RecurrentKDAPrefillWorkspace,
    add_rmsnorm_fp4quant,
    b12x_fused_moe,
    cute_dsl_fused_moe_nvfp4,
)

# ---- per-op module registry (reference jit/core.py jit_spec_registry) ----
from . import modules as _modules  # noqa: E402
from .modules import module_registry  # noqa: F401,E402


def _register_modules() -> None:
    from .ops import gmm as _gmm
    from .ops.attention import mla as _mla
    from .ops.attention import pallas_decode as _pd
    from .ops.attention import pallas_prefill as _pp

    reg = _modules.register
    reg("attention.decode.paged_streaming", _pd._paged_decode_attention,
        kind="pallas-kernel")
    reg("attention.decode.paged_combined", _pd.paged_decode_attention_combined,
        kind="pallas-kernel")
    reg("attention.decode.paged_blockspec", _pd.paged_decode_attention_blockspec,
        kind="pallas-kernel")
    reg("attention.decode.fused_append", _pd.paged_decode_attention_append,
        kind="pallas-kernel")
    reg("attention.prefill.packed", _pp.prefill_packed, kind="pallas-kernel")
    reg("attention.prefill.packed_stream", _pp.prefill_packed_stream,
        kind="pallas-kernel")
    reg("attention.mla.paged", _mla.paged_mla_attention, kind="pallas-kernel")
    reg("gemm.grouped_quant", _gmm._grouped_matmul_quant,
        kind="pallas-kernel")

    def _native_probe():
        from . import native

        return 1 if native.get_lib() is not None else 0

    reg("native.planner", _native_probe, kind="native")


_register_modules()

# ---- speculative decoding (XQA spec-decode + chain sampling, e2e) ----
from . import speculative  # noqa: E402,F401
from .speculative import (  # noqa: E402,F401
    speculative_decode_round,
    verify_tokens,
)
