"""Persistent-compilation-cache regression tests.

The axon tunnel's PJRT compile() is asynchronous: it returns in well under
jax's default `min_compile_time_secs` while the real remote compile (minutes
for the flagship programs) happens at first execution. Any positive
threshold therefore filters out EVERY program on that backend and the cache
is never written — bench.py paid a ~8-minute warmup on every invocation
until round 4. `enable_compilation_cache` must keep the threshold at 0 so
that fast-returning compiles are still persisted; a cache hit skips the
remote compile entirely (measured 249 s -> 1.4 s first call).

These tests run on the CPU backend (conftest pins JAX_PLATFORMS=cpu); the
write-path behavior under test — "a program whose compile() returns quickly
is still written" — is identical there.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from flashvtg_tpu.utils.runtime import enable_compilation_cache


def test_fast_compile_is_still_written(tmp_path):
    cache_dir = str(tmp_path / "xla_cache")
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(cache_dir)
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0

        def tiny_cache_canary(x):
            return jnp.tanh(x @ x.T) @ x

        out = np.asarray(jax.jit(tiny_cache_canary)(jnp.ones((16, 16))))
        assert np.isfinite(out).all()
        entries = [
            f for f in os.listdir(cache_dir) if "tiny_cache_canary" in f
        ]
        # This program compiles in far under 0.5 s — with the old 0.5 s
        # threshold the list is empty and every axon process recompiles.
        assert entries, os.listdir(cache_dir)
    finally:
        # restore the session-wide test cache dir from conftest
        enable_compilation_cache(prev)


def test_cache_dir_created(tmp_path):
    cache_dir = str(tmp_path / "nested" / "xla_cache")
    prev = jax.config.jax_compilation_cache_dir
    try:
        enable_compilation_cache(cache_dir)
        assert os.path.isdir(cache_dir)
    finally:
        enable_compilation_cache(prev)
