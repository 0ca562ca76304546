"""Persistent XLA compilation cache for every framework entry point.

The reference has nothing like this — TF-1 rebuilds its graph each run and
its session startup is seconds.  Under JAX every (program, shape, sharding)
pair is compiled by XLA, and on a real TPU deployment (and especially
through this environment's remote-compile relay) a cold compile of the
predict or train program costs tens of seconds to minutes.  JAX ships a
persistent on-disk compilation cache keyed on the serialized HLO +
compile options + platform; enabling it turns every warm process start
into a disk read (measured through the relay: a 12.8 s toy compile drops
to 2.0 s total process time; the full b32/640 predict program drops from
minutes to seconds — see BENCHMARKS.md round 3).

All CLIs (train / eval / predictor / serve / bench tools) call
``enable_compile_cache()`` before their first jit; it self-enables on
TPU-family platforms and stays off for pure-CPU runs (see the function
docstring).  Library users can call it themselves, point it elsewhere via
``SSD_TPU_COMPILE_CACHE``, or disable it with ``SSD_TPU_COMPILE_CACHE=0``.

Cache-key semantics are owned by JAX/XLA (compiler version and backend are
part of the key), so a stale cache can never produce a wrong executable —
only a miss.  Entries are plain files; the directory is safe to delete at
any time and safe to share between concurrent processes (writes go through
atomic renames).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "ssd_tpu", "xla_cache")

_enabled_dir: str | None = None


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache; returns the directory.

    Resolution order: explicit ``cache_dir`` argument, then the
    ``SSD_TPU_COMPILE_CACHE`` environment variable, then
    ``~/.cache/ssd_tpu/xla_cache``.  ``SSD_TPU_COMPILE_CACHE=0`` (or the
    empty string, or passing ``cache_dir=""``) disables caching and
    returns None.  Idempotent; the first successful call wins.

    By DEFAULT the cache turns on only for TPU-family platforms (where a
    cold compile costs seconds to minutes). Pure-CPU runs skip it —
    XLA:CPU compiles are fast, and its AOT loader logs a spurious
    machine-feature warning per cache entry (the serialized executable
    records ``+prefer-no-scatter/gather`` tuning pseudo-features that
    never appear in the host's feature list). Setting
    ``SSD_TPU_COMPILE_CACHE=<dir>`` (or passing ``cache_dir``) forces the
    cache on regardless of platform.
    """
    global _enabled_dir
    if cache_dir is None:
        cache_dir = os.environ.get("SSD_TPU_COMPILE_CACHE")
        if cache_dir is None:
            # Platform check via env only — never force backend init here.
            platforms = os.environ.get("JAX_PLATFORMS", "")
            if platforms.strip().lower() in ("cpu", "cpu,"):
                return None
            cache_dir = _DEFAULT_DIR
    if cache_dir in ("", "0", "off", "none"):
        return None
    if _enabled_dir is not None:
        return _enabled_dir

    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the relay makes even sub-second compiles worth a
    # disk read, and entry-size floors would silently skip small programs
    # (the eval/postprocess helpers) that still pay the relay round-trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled_dir = cache_dir
    return cache_dir
