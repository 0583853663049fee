"""Persistent XLA compilation cache wiring.

The reference pays its (CUDA) compile cost once per process via
torch.compile's on-disk inductor cache; our XLA compiles — ~4 min per
512^2 model family on the remote toolchain (engine/evaluate.py) — were
repaid on EVERY bench/CLI/battery invocation.  This helper points JAX's
persistent compilation cache at a stable directory so executables are
compiled once per (program, toolchain) and served from disk afterwards.

Resolution order for the cache directory:

1. explicit ``cache_dir`` argument (a config value),
2. ``IMGSEG_COMPILE_CACHE`` env var — a path, or ``0``/``off``/empty to
   disable,
3. the default ``~/.cache/image_segmentation_tpu/xla``.

The Trainer and Evaluator call :func:`enable_compilation_cache` at
construction (engine/train.py, engine/evaluate.py), before any jitted
program is built — every entry point (bench.py, bench_extra.py,
scripts/*) gets the cache through them; nothing calls this module
directly.  The call is idempotent, so library users embedding Trainer/
Evaluator get it for free too.
"""

from __future__ import annotations

import os
from typing import Optional

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "image_segmentation_tpu", "xla"
)
_OFF_VALUES = ("", "0", "off", "none", "false")


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Enable JAX's persistent compilation cache; returns the dir or None.

    Idempotent: re-enabling with the same directory is a no-op; a later
    call with a different explicit directory re-points the cache.

    When neither an explicit ``cache_dir`` nor the env var is given, the
    cache is only enabled off-CPU: XLA:CPU serves cached AOT executables
    compiled with host machine-feature lists that need not match the
    loading host ("could lead to execution errors such as SIGILL" per its
    loader warning), and the CPU surface here is tests/dryruns where
    compiles are cheap.  An explicit directory always enables.
    """
    import jax

    env = os.environ.get("IMGSEG_COMPILE_CACHE")
    if cache_dir is None:
        if env is not None:
            if env.lower() in _OFF_VALUES:
                return None
            cache_dir = env
        else:
            if jax.default_backend() == "cpu":
                return None
            cache_dir = _DEFAULT_DIR
    elif cache_dir.lower() in _OFF_VALUES:
        return None

    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    if jax.config.jax_compilation_cache_dir != cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every executable, however small/fast its compile: the battery's
    # sweep programs are individually cheap but numerous, and the remote
    # TPU toolchain's per-compile latency dwarfs the disk round-trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
