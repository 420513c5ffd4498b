from .utils import (  # noqa: F401
    attention_bytes,
    attention_flops,
    attention_ref,
    bench_fn,
    make_paged_kv_cache,
)
