"""Worker-process tuning shared by all engine passes."""

from __future__ import annotations

import ctypes

_tuned = False

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_malloc() -> None:
    """Keep large numpy temporaries on the heap instead of mmap.

    glibc serves >128 KiB allocations via mmap and frees them via munmap; with
    tens of concurrent workers each churning multi-MB numpy temporaries per
    Arrow batch, the resulting unmap TLB shootdowns serialize the whole host
    (measured on this box: 32-way per-task time 15.6 s -> 2.5 s from this one
    switch).  Raising the mmap/trim thresholds keeps the arena on sbrk heap and
    lets free() reuse pages without kernel round-trips.  Env vars
    (MALLOC_MMAP_THRESHOLD_) can't do this for forked Spark python workers —
    glibc has already initialized in the parent — so we call mallopt directly,
    once per worker process.
    """
    global _tuned
    if _tuned:
        return
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, 1 << 30)
    except OSError:  # non-glibc platform: harmless no-op
        pass
    _tuned = True
