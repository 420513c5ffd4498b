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
