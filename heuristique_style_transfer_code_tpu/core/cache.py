"""Persistent XLA compilation cache plumbing.

Verified to HIT under the axon remote-compile backend (PERF.md r3): the
first compile of each program is serialised to disk and later runs
deserialise it instead of recompiling — the dominant cost of small CLI runs
on the TPU here (measured 908 s cold vs 124 s warm first batch). Keys are
content-addressed (HLO + compile options + backend version), so stale hits
are impossible; any failure silently falls back to plain compilation.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "heuristique_style_transfer_code_tpu", "xla"
)


def enable_compile_cache(
    path: str | None = None, cpu_executables: bool = False
) -> str | None:
    """Enable the persistent compilation cache. ``HST_COMPILE_CACHE=<dir>``
    overrides the location, ``=0`` disables. Returns the directory in use
    (None when disabled or unavailable).

    ``cpu_executables=True`` additionally persists XLA:CPU *executables*
    (``jax_persistent_cache_enable_xla_caches='all'``) — by default JAX only
    caches non-CPU backends. Used by the tests/driver dryrun, where the
    8-virtual-device CPU mesh recompiles multi-minute SPMD programs on a
    1-core host (measured 24.9 s -> 1.5 s on the flagship forward)."""
    v = os.environ.get("HST_COMPILE_CACHE", "")
    if v == "0":
        return None
    path = v or path or DEFAULT_DIR  # env var wins, as documented
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if cpu_executables:
            try:
                jax.config.update(
                    "jax_persistent_cache_enable_xla_caches", "all"
                )
            except Exception:
                pass  # older jax: flag absent; HLO-pass cache still applies
        return path
    except Exception:
        return None  # cache is an accelerator, never a requirement
