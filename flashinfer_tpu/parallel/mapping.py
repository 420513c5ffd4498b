"""Topology mapping: rank → (dp, pp, cp, tp, moe_tp, moe_ep) group algebra.

Capability parity with reference `Mapping` (flashinfer/comm/mapping.py:21-461)
— the same group decomposition (`tp_group`, `pp_layers()`, `ep_experts()`,
`moe_*` sub-splits of the attention-TP group) — re-designed for TPU: the
groups are *named mesh axes* of a `jax.sharding.Mesh`, so collectives route
over ICI/DCN automatically and the group algebra doubles as the mesh factory.

Rank order convention matches the reference (mapping.py:73-90): pp is the
outermost axis, then dp, then cp, then tp innermost — tp neighbours are
adjacent ranks (ICI-nearest on TPU, NVLink-nearest on GPU).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class Mapping:
    """Static topology description.

    ``world_size = pp_size * dp_size * cp_size * tp_size``; the MoE subgroup
    re-splits the (cp*tp) block: ``moe_ep_size * moe_tp_size == cp_size *
    tp_size`` (reference mapping.py:118-141 semantics).
    """

    world_size: int = 1
    tp_size: int = 1
    pp_size: int = 1
    cp_size: int = 1
    moe_tp_size: int = -1
    moe_ep_size: int = -1
    attn_dp_size: int = -1  # informational; dp derives from world/pp/cp/tp
    rank: int = 0
    gpus_per_node: int = field(default=4, repr=False)  # chips per host on TPU

    def __post_init__(self):
        object.__setattr__(self, "moe_tp_size",
                           self.moe_tp_size if self.moe_tp_size != -1 else self.tp_size)
        object.__setattr__(self, "moe_ep_size",
                           self.moe_ep_size if self.moe_ep_size != -1 else self.cp_size)
        if self.moe_ep_size == 0 or self.moe_ep_size == -1:
            object.__setattr__(self, "moe_ep_size", 1)
        denom = self.pp_size * self.cp_size * self.tp_size
        if self.world_size % denom:
            raise ValueError(
                f"world_size {self.world_size} not divisible by "
                f"pp*cp*tp = {denom}"
            )
        if self.moe_tp_size * self.moe_ep_size != self.cp_size * self.tp_size:
            raise ValueError(
                "moe_tp_size * moe_ep_size must equal cp_size * tp_size "
                f"({self.moe_tp_size}*{self.moe_ep_size} != "
                f"{self.cp_size}*{self.tp_size})"
            )

    # -- size / index algebra (reference mapping.py:200-330) ---------------
    @property
    def dp_size(self) -> int:
        return self.world_size // (self.pp_size * self.cp_size * self.tp_size)

    @property
    def pp_rank(self) -> int:
        return self.rank // (self.dp_size * self.cp_size * self.tp_size)

    @property
    def dp_rank(self) -> int:
        return (self.rank // (self.cp_size * self.tp_size)) % self.dp_size

    @property
    def cp_rank(self) -> int:
        return (self.rank // self.tp_size) % self.cp_size

    @property
    def tp_rank(self) -> int:
        return self.rank % self.tp_size

    @property
    def moe_tp_rank(self) -> int:
        return (self.rank % (self.cp_size * self.tp_size)) % self.moe_tp_size

    @property
    def moe_ep_rank(self) -> int:
        return (self.rank % (self.cp_size * self.tp_size)) // self.moe_tp_size

    def is_first_pp_rank(self) -> bool:
        return self.pp_rank == 0

    def is_last_pp_rank(self) -> bool:
        return self.pp_rank == self.pp_size - 1

    def has_tp(self) -> bool:
        return self.tp_size > 1

    def has_pp(self) -> bool:
        return self.pp_size > 1

    def has_cp(self) -> bool:
        return self.cp_size > 1

    def has_moe_ep(self) -> bool:
        return self.moe_ep_size > 1

    def tp_group(self) -> list[int]:
        base = self.rank - self.tp_rank
        return list(range(base, base + self.tp_size))

    def pp_group(self) -> list[int]:
        stride = self.dp_size * self.cp_size * self.tp_size
        base = self.rank % stride
        return [base + i * stride for i in range(self.pp_size)]

    def pp_layers(self, num_layers: int) -> list[int]:
        """Contiguous layer slice owned by this pp rank (mapping.py:442)."""
        per = -(-num_layers // self.pp_size)
        lo = min(self.pp_rank * per, num_layers)
        hi = min(lo + per, num_layers)
        return list(range(lo, hi))

    def ep_experts(self, num_experts: int) -> list[int]:
        """Contiguous expert slice owned by this moe_ep rank."""
        per = -(-num_experts // self.moe_ep_size)
        lo = min(self.moe_ep_rank * per, num_experts)
        hi = min(lo + per, num_experts)
        return list(range(lo, hi))

    def node_rank(self) -> int:
        return self.rank // self.gpus_per_node

    # -- mesh factory -------------------------------------------------------
    def make_mesh(self, devices=None) -> Mesh:
        """Materialize this mapping as a Mesh with axes (pp, dp, cp, tp).

        The MoE (ep, moe_tp) view re-splits (cp, tp); use
        :func:`mesh_moe_axes` / shard_map axis tuples ("cp","tp") for EP
        collectives when moe_ep == cp and moe_tp == tp.
        """
        return make_mesh(
            pp=self.pp_size, dp=self.dp_size, cp=self.cp_size, tp=self.tp_size,
            devices=devices,
        )


def make_mesh(*, dp: int = 1, tp: int = 1, pp: int = 1, cp: int = 1,
              devices=None, axis_order: tuple[str, ...] = ("pp", "dp", "cp", "tp"),
              ) -> Mesh:
    """Build a named-axis Mesh over the given (or all) devices.

    Axis order (pp, dp, cp, tp) puts tp innermost so tp collectives ride
    the fastest ICI links — the same neighbour-adjacency rule as the
    reference's rank layout (comm/mapping.py:73-90).
    """
    sizes = {"pp": pp, "dp": dp, "cp": cp, "tp": tp}
    if devices is None:
        devices = jax.devices()
    n = int(np.prod([sizes[a] for a in axis_order]))
    if n > len(devices):
        raise ValueError(f"mesh needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape([sizes[a] for a in axis_order])
    return Mesh(dev, axis_names=axis_order)
