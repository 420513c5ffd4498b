"""Declarative MoE: config -> quantized fused-expert forward.

Experts stay quantized in HBM (int8 here; DeepSeekFp8/NVFP4/... work the
same) and stream through the grouped in-kernel-dequant GEMM.

Run: python examples/moe_layer.py   (FORCE_CPU=1 for interpret mode)
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.moe_api import (
    ExpertConfig, MoEConfig, QuantConfig, QuantVariant, RoutingConfig,
    create_moe,
)
from flashinfer_tpu.ops.routing import RoutingMethodType

E, H, I, T, top_k = 16, 256, 512, 64, 2
rng = np.random.default_rng(0)
w13 = jnp.asarray(rng.standard_normal((E, H, 2 * I)) * 0.05, jnp.bfloat16)
w2 = jnp.asarray(rng.standard_normal((E, I, H)) * 0.05, jnp.bfloat16)

cfg = MoEConfig(
    routing=RoutingConfig(num_experts=E, top_k=top_k,
                          method=RoutingMethodType.Renormalize),
    expert=ExpertConfig(intermediate_size=I),
    quant=QuantConfig(variant=QuantVariant.DeepSeekFp8),
)
moe = create_moe(cfg, w13, w2)  # quantizes + keeps experts quantized

x = jnp.asarray(rng.standard_normal((T, H)), jnp.bfloat16)
router_logits = jnp.asarray(rng.standard_normal((T, E)), jnp.float32)
y = moe.forward(x, router_logits)
print("moe out", y.shape, y.dtype, "finite:",
      bool(jnp.isfinite(y.astype(jnp.float32)).all()))
