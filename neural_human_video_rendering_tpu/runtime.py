"""Process-level JAX runtime setup shared by every entry point.

Enables the persistent XLA compilation cache so the big jitted train step
(minutes to compile at 512 px through a remote-compile TPU link) compiles
once per machine, not once per process. Call setup_jax() before the first
jit — every CLI entry point and bench.py does.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None, debug_nans: bool = False) -> None:
    import jax

    # Some deployments force-register an accelerator platform via
    # sitecustomize with a priority that outranks the JAX_PLATFORMS env
    # var. Re-assert the env var through jax.config so
    # `JAX_PLATFORMS=cpu <entry point>` reliably runs host-side (CPU
    # A/B harnesses, tests) and can never contend for the one real chip.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized: leave it be

    if debug_nans:
        jax.config.update("jax_debug_nans", True)

    cache_dir = cache_dir or os.environ.get(
        "NHVR_JAX_CACHE", os.path.expanduser("~/.cache/nhvr_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: cache flags absent; purely an optimization
