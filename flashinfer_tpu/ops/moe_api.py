"""Unified declarative MoE API.

Capability parity with reference flashinfer/fused_moe/api.py:54-705
(design doc docs/design_docs/flashinfer_moe_api.md): config objects —
`RoutingConfig`, `QuantConfig` (QuantVariant knob), `ActivationConfig`,
`ExpertConfig`, `ExecutionConfig` — composed into `MoEConfig`, with a
`MoE` runner object whose forward dispatches the TPU fused-MoE path.
The reference's per-backend configs (TrtllmFp4Config, CutlassConfig, …)
collapse to one Pallas/XLA backend on TPU.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .moe import fused_moe
from .routing import RoutingMethodType, apply_routing


class QuantVariant(enum.Enum):
    """dtype + granularity + scale-convention knob (reference api.py:54)."""

    BF16 = 0
    FP8PerTensor = 1
    DeepSeekFp8 = 2  # 128x128-block W, per-token-group A
    MxFp8 = 3
    NVFP4 = 4
    MXFP4 = 5
    MxInt4 = 6
    W4A16 = 7


class ActivationType(enum.Enum):
    Swiglu = 0
    Geglu = 1
    Relu2 = 2
    Identity = 3

    @property
    def is_gated(self) -> bool:
        return self in (ActivationType.Swiglu, ActivationType.Geglu)


@dataclass(frozen=True)
class RoutingConfig:
    num_experts: int
    top_k: int
    method: RoutingMethodType = RoutingMethodType.Renormalize
    n_group: Optional[int] = None
    topk_group: Optional[int] = None
    routed_scaling_factor: Optional[float] = None


@dataclass(frozen=True)
class QuantConfig:
    variant: QuantVariant = QuantVariant.BF16
    swizzled_scale_factors: Optional[bool] = None
    per_token_scale: Optional[bool] = None


@dataclass(frozen=True)
class ActivationConfig:
    type: ActivationType = ActivationType.Swiglu

    @property
    def is_gated(self) -> bool:
        return self.type.is_gated


@dataclass(frozen=True)
class ExpertConfig:
    intermediate_size: int
    local_expert_offset: int = 0
    local_num_experts: Optional[int] = None


@dataclass(frozen=True)
class ExecutionConfig:
    do_finalize: bool = True
    enable_pdl: Optional[bool] = None  # CUDA-ism, accepted for parity
    tune_max_num_tokens: int = 8192
    use_fused_finalize: bool = True


@dataclass(frozen=True)
class MoEConfig:
    """Full declarative MoE description (reference api.py:705)."""

    routing: RoutingConfig
    expert: ExpertConfig
    quant: QuantConfig = field(default_factory=QuantConfig)
    activation: ActivationConfig = field(default_factory=ActivationConfig)
    execution: ExecutionConfig = field(default_factory=ExecutionConfig)


_ACT_NAME = {
    ActivationType.Swiglu: "silu",
    ActivationType.Geglu: "gelu",
}


class MoE:
    """Config-bound MoE runner (reference api.py MoE object).

    weights: ``w13 [E, H, 2I]`` (gate|up concat) and ``w2 [E, I, H]``;
    quantized variants also take per-expert/block scales.
    """

    def __init__(self, config: MoEConfig, w13: jax.Array, w2: jax.Array,
                 *, w13_scale: jax.Array | None = None,
                 w2_scale: jax.Array | None = None) -> None:
        self.config = config
        self.w13, self.w2 = w13, w2
        self.w13_scale, self.w2_scale = w13_scale, w2_scale
        v = config.quant.variant
        if v not in (QuantVariant.BF16, QuantVariant.FP8PerTensor,
                     QuantVariant.DeepSeekFp8):
            raise NotImplementedError(
                f"{v}: fp4/int4 experts route via ops.gemm.grouped_mm_fp4 — "
                "unified-API wiring lands in a later revision"
            )

    def forward(self, hidden_states: jax.Array, router_logits: jax.Array
                ) -> jax.Array:
        r = self.config.routing
        ids, wts = apply_routing(
            r.method, router_logits.astype(jnp.float32), r.top_k,
            n_group=r.n_group or 8, topk_group=r.topk_group or 4,
            routed_scaling_factor=r.routed_scaling_factor or 2.5,
        )
        act = _ACT_NAME.get(self.config.activation.type, "silu")
        w13, w2 = self.w13, self.w2
        kw: dict[str, Any] = {}
        v = self.config.quant.variant
        if v == QuantVariant.FP8PerTensor:
            kw.update(w13_scale=self.w13_scale, w2_scale=self.w2_scale)
        elif v == QuantVariant.DeepSeekFp8:
            # block-dequant once (XLA folds into the weight stream)
            def dq(w, s):
                e, a, b = w.shape
                wf = w.astype(jnp.float32).reshape(
                    e, a // 128, 128, b // 128, 128)
                return (wf * s[:, :, None, :, None]).reshape(e, a, b).astype(
                    jnp.bfloat16)
            w13 = dq(w13, self.w13_scale)
            w2 = dq(w2, self.w2_scale)
        out = fused_moe(hidden_states, w13, w2, ids, wts, activation=act,
                        **kw)
        if not self.config.execution.do_finalize:
            return out, ids, wts
        return out

    __call__ = forward


def create_moe(config: MoEConfig, w13: jax.Array, w2: jax.Array, **kw) -> MoE:
    """Factory (reference api.py create path)."""
    return MoE(config, w13, w2, **kw)
