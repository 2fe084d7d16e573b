"""Persistent XLA compilation cache, enabled TPU-backend-only.

The 608^2 train step takes minutes to compile through the relay; the
persistent cache makes CLI/bench/tool reruns start in seconds. CPU is
excluded deliberately: CPU compiles are fast, and serializing
shard_map+Pallas CPU executables for the cache can abort the process
(glibc abort inside the XLA cache write — seen when CLI tests enabled
the cache process-wide before the shard_map stem tests ran).

Set ``APFP_COMPILE_CACHE=0`` to disable.
"""

import os

import jax


def enable_compile_cache() -> bool:
    """Point jax at ``~/.cache/apfp_jax`` when on the TPU backend.

    Returns True when the cache was enabled. Safe to call repeatedly.
    """
    if os.environ.get("APFP_COMPILE_CACHE", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return False
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/apfp_jax"))
    return True
