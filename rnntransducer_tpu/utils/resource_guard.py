"""Virtual-memory map guard for long-lived XLA:CPU processes.

Every XLA:CPU executable JIT'd in-process holds anonymous mappings (code +
rodata + data pages) for as long as jax's executable caches retain it.  A
process that keeps compiling *distinct* programs — a large test suite, a
many-shape serving fleet — accumulates mappings without bound and eventually
hits the kernel's ``vm.max_map_count`` (65530 by default).  Past that point
``mmap`` fails with ENOMEM, ``operator new`` inside jaxlib throws
``std::bad_alloc`` mid-compile, and the process dies with SIGABRT
(``std::terminate``) or SIGSEGV (the unwinder faulting during exception
propagation) — diagnosed from the round-2 full-suite crash cores: fault RIP
in libgcc ``_Unwind_RaiseException`` under ``__cxa_throw``, ~33k anonymous
JIT mappings at death, map count growing linearly with tests executed.

``maybe_clear_jax_caches`` bounds the growth: when the process map count
crosses ``threshold``, drop jax's in-process executable caches (re-compiles
are cheap when the persistent compilation cache is on) and gc.  Measured:
compiling 200 distinct programs grows maps 440 -> 1101; clear+gc returns to
503, repeatably.
"""

from __future__ import annotations

import gc
import os

# Default kernel vm.max_map_count is 65530; clear with ample headroom so the
# largest single compilation (thousands of maps for a big program) still fits.
DEFAULT_THRESHOLD = 20_000


def vm_map_count() -> int:
    """Number of memory mappings of this process (0 where /proc is absent)."""
    try:
        with open(f"/proc/{os.getpid()}/maps", "rb") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


def maybe_clear_jax_caches(threshold: int = DEFAULT_THRESHOLD) -> bool:
    """Clear jax's executable caches when the map count exceeds threshold.

    Returns True if a clear ran.  Call this between units of work (tests,
    requests, training jobs) in processes that compile unbounded families of
    distinct programs; steady-shape training/serving never triggers it.
    """
    n = vm_map_count()
    if n <= threshold:
        return False
    import jax

    jax.clear_caches()
    gc.collect()
    return True
