"""glibc malloc threshold pinning for chunk-buffer reuse.

The tuning is best-effort and platform-gated; on the Linux/glibc CI
host it must apply, be idempotent, and leave allocation behavior
functionally unchanged (same values, just sbrk-heap-serviced)."""

import numpy as np

from atlas_upscaling_dask_spark.malloc_tuning import pin_large_alloc_reuse


def test_pin_applies_and_is_idempotent():
    assert pin_large_alloc_reuse() is True  # glibc host
    assert pin_large_alloc_reuse() is True  # second call: cached


def test_allocation_behavior_unchanged_after_pin():
    pin_large_alloc_reuse()
    # chunk-sized buffers (above the old mmap threshold) still work
    for _ in range(10):
        a = np.arange(600_000, dtype=np.uint32)  # 2.4 MB
        assert int(a[-1]) == 599_999
        b = a.tobytes()
        assert len(b) == 2_400_000
        del a, b
