"""Page-size / DMA-depth sweep for the paged-decode headline geometry.

VERDICT r4 ask #7: plan-time page-size selection. r4 found ps16 > ps32
isolated at kv1024 (777.6 vs 671.6 GB/s) but losing in-model. This
sweep measures the headline geometry (b64 kv2048) across page sizes in
ONE process (same draw) so the comparison is sound.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from benchmarks.routines.attention import bench_decode_attention  # noqa: E402


def main() -> None:
    for ps in (16, 32):
        r = bench_decode_attention(page_size=ps)
        r["page_size"] = ps
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
