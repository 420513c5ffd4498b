"""A/B: small-M dense int8-weight GEMM — XLA fused convert-dot vs the
Pallas gmm kernel (E=1 degenerate group).

The model-decode attribution (docs/design.md) puts the 32L b64 step's MLP
GEMMs at ~83% of the int8 weight-streaming roofline via the XLA path; if
the Pallas in-kernel-dequant kernel streams closer to roofline at M=64 it
becomes the decode-step MLP path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/dense_smallm_ab.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax.numpy as jnp
import numpy as np

from flashinfer_tpu.ops.gmm import _grouped_matmul_quant
from flashinfer_tpu.testing.utils import bench_loop


def run(m=64, k=4096, n=14336):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(rng.random((1, n)) * 0.02, jnp.float32)

    wbytes = k * n

    def report(name, dt):
        print(f"{name:28s} {dt*1e6:8.1f} us  {wbytes/dt/1e9:7.1f} GB/s-w")

    def to_xshape(y):  # feed back a [m,k]-shaped dependent value
        if n >= k:
            return y[:, :k]
        return jnp.pad(y, ((0, 0), (0, k - n)))

    # 1) XLA fused convert-dot (the current _mm path)
    def step_xla(x, wq, scale):
        y = (x @ wq.astype(x.dtype)) * scale.astype(x.dtype)
        return to_xshape(y).astype(x.dtype)

    report("xla_fused", bench_loop(step_xla, x, wq, scale, iters=16))

    # 2) Pallas gmm, E=1, tile sweep
    wq3 = wq[None]
    s3 = jnp.ones((1, k // 128, n // 128), jnp.float32)
    gs = jnp.asarray([m], jnp.int32)
    for tm in (64, 128):
        for tn in (512, 1024, 2048):
            def step_gmm(x, gs, wq3, s3, tm=tm, tn=tn):
                y = _grouped_matmul_quant(x, gs, wq3, s3, tm=tm, tn=tn)
                return to_xshape(y).astype(x.dtype)
            try:
                dt = bench_loop(step_gmm, x, gs, wq3, s3, iters=16)
                report(f"gmm tm{tm} tn{tn}", dt)
            except Exception as e:
                print(f"gmm tm{tm} tn{tn}: {str(e)[:120]}")


if __name__ == "__main__":
    for shape in [(64, 4096, 14336), (64, 14336, 4096), (64, 4096, 6144)]:
        print("shape", shape)
        run(*shape)
