"""JAX runtime configuration helpers.

The production environment reaches the TPU through a remote tunnel where
compilation costs minutes; the persistent compilation cache makes every
subsequent process start fast.  Called lazily by the device engine.
"""

from __future__ import annotations

import os

_configured = False


def configure_jax(cache_dir: str | None = None) -> None:
    global _configured
    if _configured:
        return
    _configured = True
    import jax

    # RTC_PLATFORM=cpu forces the host backend even where a sitecustomize
    # registered a TPU platform at interpreter start (the JAX_PLATFORMS env
    # var alone is not enough there) — used by tests, the verify drive, and
    # deployments with an unreachable accelerator.
    plat = os.environ.get("RTC_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".cache", "jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def force_cpu() -> None:
    """Restrict JAX to the host CPU (used by tests and the multichip
    dry-run; overrides the axon sitecustomize platform registration)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
