"""flashinfer-tpu: TPU-native LLM inference kernel engine.

A ground-up JAX/XLA/Pallas re-design with the capability surface of
FlashInfer (reference: flashinfer/__init__.py:25-247): paged/ragged KV-cache
attention (decode, prefill, cascade, MLA, sparse), quantized GEMM/grouped-GEMM
(FP8 groupwise, FP4), fused MoE with routing, sorting-free sampling/top-k,
fused RoPE/norm/activation ops, and mesh-parallel serving primitives.
"""

from .version import __version__  # noqa: F401

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
