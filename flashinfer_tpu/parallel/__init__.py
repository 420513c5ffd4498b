"""Parallelism & communication layer (TPU-native).

Capability parity with reference flashinfer/comm/ + parallel_attention/
(SURVEY §2.7): process/topology mapping, TP collectives, sequence
parallelism (Ulysses + ring attention), decode context parallelism, and
expert-parallel dispatch/combine — re-designed over `jax.sharding.Mesh`
named axes and XLA collectives (psum / all_gather / all_to_all / ppermute)
inside `shard_map`, instead of NCCL/NVSHMEM/IPC kernels.
"""

from .mapping import Mapping, make_mesh  # noqa: F401
from .collectives import (  # noqa: F401
    all_gather,
    all_reduce,
    all_to_all,
    allreduce_fusion,
    reduce_scatter,
)
from .ulysses import UlyssesCommunicator, gather_heads, scatter_heads  # noqa: F401
from .ring import ring_attention  # noqa: F401
from .ep import (  # noqa: F401
    MoEEpLayer,
    MoEEpRankEvictedError,
    ep_combine,
    ep_dispatch,
    moe_ep_forward,
)
from .dcp import dcp_decode_attention, dcp_merge  # noqa: F401
from .fused import (  # noqa: F401
    all_gather_matmul,
    gemm_allreduce,
    matmul_reduce_scatter,
)
from .parallel_attention import ParallelAttention, ParallelConfig  # noqa: F401
from .mixed_comm import (  # noqa: F401
    MixedCommMode,
    mixed_comm_layer,
    mixed_comm_post,
    mixed_comm_pre,
)
