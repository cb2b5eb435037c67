"""Runtime helpers: compilation caching and platform quirks.

The axon TPU tunnel remote-compiles XLA programs with high and variable
latency (seconds to minutes); a persistent on-disk compilation cache makes
every program a one-time cost across processes. Note also that on this
platform `block_until_ready` does not reliably fence execution — benchmarks
and tests must fetch (np.asarray) an output to synchronize.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/flashvtg_tpu_xla")


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when a site plugin pre-imported jax.

    The axon tunnel's sitecustomize imports jax before user code runs and
    latches its own platform, silently ignoring a JAX_PLATFORMS value set by
    the user's shell. Re-apply it through the config API, which always wins.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass


def setup(cache: bool = True) -> None:
    """Standard process setup for CLI entry points."""
    apply_platform_env()
    if cache:
        enable_compilation_cache()


def enable_compilation_cache(cache_dir: str = _DEFAULT_CACHE_DIR) -> None:
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    try:
        dir_changed = jax.config.jax_compilation_cache_dir != cache_dir
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        if dir_changed:
            # jax materializes its cache object lazily and never re-reads
            # the dir config afterwards — without a reset, a dir change
            # after any compile in this process silently keeps writing to
            # the old location.
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        # min_compile_time MUST be 0: the axon PJRT client's compile() is
        # asynchronous — it returns a handle in <0.5 s while the real remote
        # compile (minutes for the flagship programs) happens at first
        # execution. jax measures only the client-side call, so any positive
        # threshold filters out every program and the cache is never written.
        # With 0, a cache hit skips the remote compile entirely (measured:
        # 249 s -> 1.4 s first call for a scan-of-matmuls probe).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # config names vary across jax versions
        pass
