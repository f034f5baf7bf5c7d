"""Persistent XLA compilation cache.

The I3D trunk takes minutes to compile on TPU; the VSLNet train step tens of
seconds. Enabling JAX's persistent compilation cache makes every process
after the first start instantly. Called by all CLI entry points; disable
with VSLNET_COMPILE_CACHE=0 or point elsewhere with VSLNET_COMPILE_CACHE=<dir>.
"""
import os

import jax

_DONE = False


def enable_compilation_cache():
    global _DONE
    if _DONE:
        return
    _DONE = True
    setting = os.environ.get("VSLNET_COMPILE_CACHE", "")
    if setting == "0":
        return
    cache_dir = setting or os.path.join(
        os.path.expanduser("~"), ".cache", "vslnet_tpu", "xla"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
