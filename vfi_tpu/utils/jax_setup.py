"""Process-level JAX configuration helpers.

Call :func:`setup_jax` early in every CLI: enables the persistent
compilation cache (first full-size bi-TAI compile on the TPU tunnel costs
minutes; subsequent processes hit the cache) and exposes a profiler hook.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compile cache for accelerator runs.

    Forced-CPU runs skip it: CPU compiles take seconds, and XLA's cache key
    does not include the host's CPU features, so a cache shared with a
    remote-compile TPU workflow can serve CPU-AOT executables built for a
    DIFFERENT machine — observed as "machine type doesn't match" error spam
    and a ~30 s first step even on toy models.
    """
    import jax

    # The JAX_PLATFORMS env var is NOT authoritative: a platform plugin's
    # sitecustomize (e.g. the axon TPU tunnel) can have already overridden
    # the config to "axon,cpu" before this process's first line of user code
    # ran, which makes the plugin the DEFAULT backend of a "CPU" run — slow
    # at best, and a hard startup freeze whenever the tunnel is wedged.
    # Honor the user's env var by re-pinning the config (backends are not
    # initialized yet when CLIs call setup_jax(), so the update sticks).
    env = os.environ.get("JAX_PLATFORMS", "")
    cfg = jax.config.jax_platforms or ""
    if "cpu" in (env.split(",")[0].strip(), cfg.split(",")[0].strip()):
        jax.config.update("jax_platforms", "cpu")
        return

    cache_dir = cache_dir or os.environ.get(
        "VFI_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/vfi_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        print(f"warning: compilation cache unavailable: {e}")


def start_profiler_server(port: int = 9999) -> None:
    """Start the jax profiler trace server (SURVEY.md §5.1 gap)."""
    import jax

    jax.profiler.start_server(port)


def trace_dir() -> str:
    d = os.environ.get("VFI_TPU_TRACE_DIR", "/tmp/vfi_tpu_trace")
    os.makedirs(d, exist_ok=True)
    return d
