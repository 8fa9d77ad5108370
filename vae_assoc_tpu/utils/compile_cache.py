"""Persistent XLA compilation cache — cut cold-start compiles to disk reads.

The reference framework (pure TF1 Session) had no compile step to
amortize; this rebuild's jitted programs do, and on the tunnel-attached
TPU a single XLA compile measures ~30-60 s main-thread (docs/PERF.md
"Serving"). The serving front end bounds and warms its whole compile set
at startup, so a restart re-pays every one of those compiles — unless
they come from JAX's persistent compilation cache instead, which turns a
recompile into a disk read keyed on (HLO, compile options, backend).

Measured on the real backend (fresh processes, same program): first run
182 s compile+run, second run 60 s — the compile is eliminated and the
residual is backend init + tunnel transfer. For a server warming N
programs the win is ~N compiles.

Usage: call :func:`enable_compile_cache` once, any time before the
compiles you want cached (before OR after jax initializes — the cache
dir is consulted per-compile). Opt-in via ``--compile-cache DIR`` on the
serving and training CLIs.
"""
from __future__ import annotations

import os

__all__ = ["enable_compile_cache"]


def enable_compile_cache(cache_dir: str | os.PathLike,
                         *, min_compile_time_secs: float = 0.0) -> str:
    """Point JAX's persistent compilation cache at ``cache_dir``.

    Creates the directory if needed. ``min_compile_time_secs=0`` caches
    every program — right for this framework, whose compile set is small
    (bounded serving buckets, a handful of train-step programs) and whose
    per-compile cost is dominated by the device link, not program size.
    Entries are keyed on the HLO + compile options + backend, so CPU test
    runs and TPU runs never collide in the same directory.

    Returns the directory path (as str) for logging.
    """
    import jax

    path = os.fspath(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    # Cache regardless of entry size; the set is bounded by design.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
