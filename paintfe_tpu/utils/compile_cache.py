"""Persistent XLA compilation-cache wiring.

The reference CLI is a native binary with zero warmup (src/cli.rs:105-216);
a fresh JAX process instead re-jits every program it touches (measured
round 3: 37 s on CPU, >120 s on the TPU backend for the first file of a
batch).  Pointing XLA's persistent cache at a per-user directory makes
every invocation after the first load serialized executables from disk,
so a cold CLI process reaches the reference's "no warmup" behavior up to
the (fast) cache-deserialization cost.

Enabled automatically by the CLI and the serving daemon.  Override the
location with $PAINTFE_COMPILE_CACHE; disable with
PAINTFE_COMPILE_CACHE=off.
"""

from __future__ import annotations

import os
from typing import Optional

_DISABLE_VALUES = {"", "0", "off", "none", "disabled"}

_stats = {"hits": 0, "misses": 0, "saved_sec": 0.0}
_registered = False


def enable_persistent_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Route every jit compile through an on-disk cache; returns the cache
    directory in use, or None when disabled.

    Resolution order: explicit argument > $PAINTFE_COMPILE_CACHE >
    a directory JAX was already configured with (e.g. via
    $JAX_COMPILATION_CACHE_DIR) > `<user config dir>/xla_cache`.

    Must run before the programs of interest first compile (config changes
    only affect subsequent compiles); the CLI calls it at startup.
    """
    import jax

    if cache_dir is None:
        env = os.environ.get("PAINTFE_COMPILE_CACHE")
        if env is not None and env.strip().lower() in _DISABLE_VALUES:
            return None
        cache_dir = env or jax.config.jax_compilation_cache_dir
    if not cache_dir:
        from paintfe_tpu.utils.settings import default_config_dir

        cache_dir = str(default_config_dir() / "xla_cache")
    cache_dir = str(cache_dir)
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None  # unwritable location: run uncached rather than fail
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: a CLI process compiles each program exactly once,
    # so persisting even sub-second compiles is pure win next invocation
    # (the defaults skip entries cheaper than 1 s).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    install_cache_counters()
    return cache_dir


def install_cache_counters() -> dict:
    """Count persistent-cache hits/misses via jax.monitoring (idempotent).
    Returns the live stats dict {hits, misses, saved_sec}."""
    global _registered
    if _registered:
        return _stats
    import jax

    def _on_event(event: str, **kwargs) -> None:
        if event == "/jax/compilation_cache/cache_hits":
            _stats["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            _stats["misses"] += 1

    def _on_duration(event: str, duration_secs: float, **kwargs) -> None:
        if event == "/jax/compilation_cache/compile_time_saved_sec":
            _stats["saved_sec"] += duration_secs

    jax.monitoring.register_event_listener(_on_event)
    jax.monitoring.register_event_duration_secs_listener(_on_duration)
    _registered = True
    return _stats


def cache_stats() -> dict:
    return dict(_stats)


def cache_report() -> str:
    """One-line summary for --profile output."""
    d = jax_cache_dir()
    where = f" ({d})" if d else " (disabled)"
    return (f"  compile cache{where}: {_stats['hits']} hit(s), "
            f"{_stats['misses']} miss(es), "
            f"{_stats['saved_sec']:.1f}s compile time saved")


def jax_cache_dir() -> Optional[str]:
    import jax

    return jax.config.jax_compilation_cache_dir
