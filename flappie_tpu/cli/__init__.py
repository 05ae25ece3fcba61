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


def enable_persistent_cache() -> str | None:
    """Point JAX's on-disk compilation cache at a per-user directory so
    repeat CLI invocations skip recompiles.

    The reference compiles once at build time (weights are compiled-in
    C arrays, src/networks.c:10-14); a jit-based CLI would otherwise
    pay the full XLA compile EVERY process.  Through this environment's
    remote-compile service that cost is large and highly variable (the
    same chunk program measured 13 s to 25 min); with the cache the
    second process's first call dropped 369 s -> 33 s (measured, and
    the residual is weights upload + the run itself, not compile).

    ``FLAPPIE_TPU_JAX_CACHE`` overrides the directory; ``off``/``0``
    disables.  Returns the directory in use (None when disabled or
    when jax is unavailable/already finalised).
    """
    v = os.environ.get("FLAPPIE_TPU_JAX_CACHE", "")
    if v.lower() in ("off", "0", "none"):
        return None
    path = v or os.path.join(
        os.path.expanduser("~"), ".cache", "flappie_tpu", "jax_cache"
    )
    try:
        import jax

        # Only when a cache dir is explicitly pinned does CPU opt in:
        # local CPU compiles are quick (the cache exists for the
        # remote-compile service), and serializing XLA:CPU executables
        # of the big fused programs has segfaulted the interpreter
        # (observed in the test suite's in-process CLI runs).  Ask the
        # resolved backend, not the config string: on a host with no
        # accelerator plugin jax auto-selects CPU with jax_platforms
        # unset, and spellings like "CPU" or "cpu,tpu" must resolve
        # too.  The CLI initialises the backend immediately after this
        # anyway, so default_backend() costs nothing extra.
        if not v and jax.default_backend() == "cpu":
            return None
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache even quick compiles: the tunnel makes every compile
        # round trip expensive regardless of XLA's own work
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None
    return path
