"""A/B: model decode with separate vs fused (QKV | gate-up) weights.

Same-process, same-draw comparison at the driver geometry
(32L-8B-int8-int8kv-inject b64 kv1024). Decode GEMMs at M=64 are
weight-bound; fusing merges 4 launches per layer into 2 and widens the
N dim the MXU sees.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from benchmarks.routines.model import bench_model_decode  # noqa: E402


def main() -> None:
    from benchmarks.routines.sampling import bench_top_k_top_p_sampling

    for fused in (False, True):
        r = bench_model_decode(weight_dtype="int8", fused_weights=fused)
        r["fused_weights"] = fused
        print(json.dumps(r), flush=True)
    print(json.dumps(bench_top_k_top_p_sampling()), flush=True)


if __name__ == "__main__":
    main()
