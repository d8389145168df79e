"""Persistent XLA compilation cache.

Compiles on the remote TPU service are slow (minutes for large programs);
the persistent cache makes repeat invocations of bench/train scripts hit
disk instead of recompiling.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/vit_marl_tpu_xla") -> None:
    import jax

    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
