"""Worker-process allocator tuning for numpy-heavy kernels.

glibc malloc serves large blocks (>128 KiB) with mmap and returns them
with munmap.  A kernel like ``encode_bucket`` allocates ~15 array
temporaries per call, so every task pays a fresh page-fault storm — and
at 16-32 concurrent workers the kernel-side zone-lock contention makes
each task *several times slower* than it is alone (measured on the bench
box: 1.36 s/bucket alone → 10.8 s/bucket at 32-way; see BASELINE.md).

``tune_allocator()`` raises M_MMAP_THRESHOLD and M_TRIM_THRESHOLD so
large temporaries are served from the retained heap instead: pages are
faulted once per worker process and reused by every subsequent task.
Call it at the top of any hot map_batches kernel — it is idempotent and
a safe no-op on non-glibc platforms.
"""

from __future__ import annotations

_tuned = False


def tune_allocator(mmap_threshold: int = 1 << 30, trim_threshold: int = 1 << 30) -> bool:
    """Idempotent per-process malloc tuning; returns True if applied."""
    global _tuned
    if _tuned:
        return True
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        # glibc mallopt param constants: M_TRIM_THRESHOLD=-1, M_MMAP_THRESHOLD=-3
        libc.mallopt(-3, int(mmap_threshold))
        libc.mallopt(-1, int(trim_threshold))
        _tuned = True
    except Exception:
        return False
    return True
