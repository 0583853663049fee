"""Persistent XLA compilation cache (utils/compile_cache.py).

The reference amortizes compiles via torch.compile's inductor disk cache;
our equivalent must (a) write executables to the cache directory on first
compile and (b) serve them from disk — not recompile — on a later run.
"""

import logging
import os

import jax
import jax.numpy as jnp
import pytest

from image_segmentation_tpu.utils import compile_cache


@pytest.fixture
def restore_cache_config():
    yield
    jax.config.update("jax_compilation_cache_dir", None)


def test_off_values_disable(restore_cache_config):
    assert compile_cache.enable_compilation_cache("off") is None
    assert compile_cache.enable_compilation_cache("0") is None


def test_cache_populated_and_reused(tmp_path, caplog, restore_cache_config):
    cache_dir = str(tmp_path / "xla-cache")
    got = compile_cache.enable_compilation_cache(cache_dir)
    assert got == cache_dir and os.path.isdir(cache_dir)

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    f(jnp.arange(7.0)).block_until_ready()
    entries = sorted(os.listdir(cache_dir))
    assert entries, "first compile must populate the cache directory"

    # Drop the in-memory executable so the next call goes back to the
    # compiler — which must hit the persistent cache instead of recompiling.
    jax.clear_caches()
    with caplog.at_level(logging.DEBUG, logger="jax._src.compiler"):
        f(jnp.arange(7.0)).block_until_ready()
    assert any(
        "compilation cache hit" in r.getMessage().lower()
        for r in caplog.records
    ), "re-compile after clear_caches must be served from the persistent cache"
    assert sorted(os.listdir(cache_dir)) == entries, (
        "a cache hit must not write a new entry"
    )
