"""Persistent XLA compilation cache wiring.

The framework's fused programs are large (the chunked two-stage scan is the
biggest in the codebase) and on a remote-compile TPU link a cold build of the
full pipeline costs minutes of wall clock. XLA's persistent compilation cache
serializes every compiled executable to disk keyed by (program, flags,
topology), so any later process on the same machine -- a benchmark rerun, the
test suite, a dataset example main -- skips straight to execution. The
reference has no analogue (C++ ahead-of-time build); for a JIT framework the
cache IS the ahead-of-time build.

Call :func:`enable_persistent_cache` before the first backend use. It is the
first thing ``bench.py``, ``__graft_entry__.py``, and ``tests/conftest.py``
do.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Respects ``AMOS_SLAM_NO_JIT_CACHE=1`` (disable) and
    ``AMOS_SLAM_JIT_CACHE_DIR`` (override location). Returns the cache dir
    in use, or None when disabled or unavailable.
    """
    if os.environ.get("AMOS_SLAM_NO_JIT_CACHE") == "1":
        return None
    path = (
        cache_dir
        or os.environ.get("AMOS_SLAM_JIT_CACHE_DIR")
        or _DEFAULT_DIR
    )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took real compile time; tiny programs
        # recompile faster than they deserialize
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return path
