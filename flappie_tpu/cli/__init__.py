"""Command-line entry points (flappie, runnie, decode_runnie, ...)."""

from __future__ import annotations

import os


def honor_jax_platforms() -> None:
    """Make JAX_PLATFORMS work even when a site hook preloads jax.

    jax captures JAX_PLATFORMS at import; an environment whose
    sitecustomize imports jax (to register an out-of-tree TPU plugin)
    does so before this process's env-derived intent can apply, so
    ``JAX_PLATFORMS=cpu python -m flappie_tpu.cli.flappie`` would
    silently run on the plugin backend.  The backend itself initialises
    lazily, so re-applying the env var through jax.config at main()
    start restores the documented semantics.  No-op when the var is
    unset or the backend is already live.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # backend already initialised: keep whatever it chose
