"""Persistent XLA compilation cache.

The I3D trunk takes minutes to compile on TPU; the VSLNet train step tens of
seconds. Enabling JAX's persistent compilation cache makes every process
after the first start instantly. Called by all CLI entry points; disable
with VSLNET_COMPILE_CACHE=0/off/false/no or point elsewhere with
VSLNET_COMPILE_CACHE=<dir>.
"""
import os

import jax

_DONE = False


def honor_jax_platforms_env():
    """Re-assert the user's JAX_PLATFORMS env var over plugin edits.

    The remote-TPU (axon) PJRT plugin rewrites `jax.config.jax_platforms`
    to "axon,cpu" during plugin discovery at import time, so an explicit
    `JAX_PLATFORMS=cpu python main.py ...` still tries axon first — and
    hangs in the plugin's connect-retry sleep whenever the tunnel is down.
    An env var the user set by hand outranks a plugin default; put it
    back. No-op when the env var is unset or a backend already exists
    (too late to change the platform order safely)."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return
    try:
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return
        if str(jax.config.jax_platforms or "") != want:
            jax.config.update("jax_platforms", want)
    except Exception:
        pass  # never fail startup over platform-order hygiene


def enable_compilation_cache():
    """Common CLI startup hook: every entry point calls this once, early,
    so platform-env hygiene rides along with the cache setup."""
    global _DONE
    if _DONE:
        return
    _DONE = True
    honor_jax_platforms_env()
    setting = os.environ.get("VSLNET_COMPILE_CACHE", "")
    if setting.strip().lower() in ("0", "off", "false", "no", "disable", "disabled", "none"):
        return
    if not setting:
        # Default-on only for accelerator backends, where compiles cost
        # tens of seconds to minutes. XLA:CPU entries are AOT machine code
        # whose embedded feature set includes compiler-derived tuning
        # features (e.g. prefer-no-scatter) that no host signature can
        # reproduce — reloading them after a VM host change warns "could
        # lead to SIGILL" and has aborted test runs. CPU compiles are
        # cheap; caching them is all risk, no win. An explicit
        # VSLNET_COMPILE_CACHE=<dir> still opts in on any backend.
        #
        # CRITICAL: decide WITHOUT initializing a backend. This runs at
        # import time in every entry point, and jax.default_backend()
        # would initialize the remote-TPU (axon) backend — which blocks
        # in an indefinite connect-retry sleep whenever the tunnel is
        # down, hanging every CLI before argv parsing. Read the selected
        # platform from config/env instead; only ask a backend that is
        # already live.
        try:
            from jax._src import xla_bridge

            if xla_bridge.backends_are_initialized():
                platform = jax.default_backend()
            else:
                platform = (
                    str(jax.config.jax_platforms or "")
                    or os.environ.get("JAX_PLATFORMS", "")
                ).split(",")[0].strip().lower()
        except Exception:
            return
        if platform == "cpu" or not platform:
            # unknown (auto-detect) counts as CPU: enabling would require
            # initializing a backend to find out, and the cache is only a
            # startup optimization
            return
    cache_dir = host_scoped_cache_dir(
        setting or os.path.join(
            os.path.expanduser("~"), ".cache", "vslnet_tpu", "xla"
        )
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it


def host_scoped_cache_dir(base_dir):
    """Scope a compile-cache dir by host CPU microarchitecture: XLA:CPU
    stores AOT machine code keyed only by program, so an entry compiled on
    a host with different CPU features (VM migration, shared cache dir)
    loads but can SIGILL/abort at execution ("Machine type used for
    XLA:CPU compilation doesn't match the machine type for execution").
    TPU executables embed their own compatibility checks; the host
    signature subdir makes stale-machine reuse structurally impossible
    for both. Also used by tests/conftest.py for the CPU test cache."""
    try:
        import hashlib
        import platform

        sig_src = platform.machine() + ":" + platform.processor()
        try:
            # model name/family/stepping matter beyond the CPUID flags:
            # XLA picks per-microarchitecture tuning features (e.g.
            # +prefer-no-scatter on some AVX-512 parts) from the CPU
            # model, so two hosts with identical flags can still produce
            # AOT entries the other host's loader rejects as mismatched
            want = ("flags", "model name", "model\t", "cpu family",
                    "stepping")
            seen = set()
            with open("/proc/cpuinfo") as f:
                for line in f:
                    key = line.split(":")[0].strip()
                    if line.startswith(want) and key not in seen:
                        seen.add(key)
                        sig_src += ":" + line.strip()
                    if len(seen) == len(want):
                        break
        except OSError:
            pass
        return os.path.join(
            base_dir, hashlib.sha256(sig_src.encode()).hexdigest()[:12]
        )
    except Exception:
        return base_dir
