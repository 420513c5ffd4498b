"""Model layer: flagship end-to-end models built from flashinfer_tpu ops.

The reference is a kernel library whose "model layer" lives in adopters
(SURVEY §1); this package is the adopter-side demonstration — a paged-KV
serving transformer (Llama-3 geometry, optional MoE) wired through the
framework's attention / rope / norm / activation / MoE / sampling ops,
with shard_map-sharded variants for dp/tp/pp/ep/sp execution.
"""

from .llama import (  # noqa: F401
    LlamaConfig,
    decode_step,
    init_kv_cache,
    init_params,
    make_sharded_decode_fn,
    prefill,
)
from . import deepseek  # noqa: F401
from .deepseek import DeepseekConfig  # noqa: F401
from . import qwen_next  # noqa: F401
from .qwen_next import QwenNextConfig  # noqa: F401
from . import hf  # noqa: F401
from .hf import load_hf_llama  # noqa: F401
