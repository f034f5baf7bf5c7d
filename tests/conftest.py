import os

# Tests run on a simulated 8-device CPU mesh so pjit sharding and collectives
# are exercised without TPU hardware (SURVEY.md §4). The environment presets
# JAX_PLATFORMS=axon (real TPU) and plugins may import jax before this file
# runs, so use jax.config.update (effective until backend init) rather than
# env vars alone.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# This box has ONE CPU core and the suite's wall time is dominated by
# XLA:CPU compilation of tiny train steps. Low backend-optimization
# effort halves measured cold compile time (44.9s -> 30.6s for one cold
# e2e test, warm runtime unchanged at ~15s) and the pinned numerics are
# unaffected (golden_losses + reference-parity verified under these
# flags). Opt out with VSLNET_TEST_FAST_COMPILE=0.
if os.environ.get("VSLNET_TEST_FAST_COMPILE", "1").lower() not in (
        "0", "off", "false", "no"):
    _fast = ("--xla_backend_optimization_level=0"
             " --xla_llvm_disable_expensive_passes=true")
    if _fast not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " " + _fast).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS handles it
jax.config.update("jax_threefry_partitionable", True)

# Persistent XLA compile cache for the suite: most of the wall time is
# XLA:CPU compilation of near-identical tiny train steps, and warm
# entries cut measured file times ~4x. The dir is scoped by host CPU
# signature (utils/cache.py) so a VM host change can never load foreign
# AOT machine code (the historical SIGILL/abort mode). Opt out with
# VSLNET_TEST_COMPILE_CACHE=0.
if os.environ.get("VSLNET_TEST_COMPILE_CACHE", "1").lower() not in (
        "0", "off", "false", "no"):
    from vslnet_tpu.utils.cache import host_scoped_cache_dir

    _cache_base = (
        os.environ.get("VSLNET_TEST_COMPILE_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "vslnet_tpu",
                        "xla-tests")
    )
    _cache_dir = host_scoped_cache_dir(_cache_base)
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
        # subprocess smoke tests opt into the same cache (their CLI entry
        # points scope the base dir by host signature identically)
        os.environ.setdefault("VSLNET_COMPILE_CACHE", _cache_base)
    except Exception:
        pass  # cache is an optimization; never fail collection over it


# In-process Runner.train() installs a SIGTERM handler (on_preempt=save
# default) that only flips a flag — so a stray SIGTERM delivered to the
# pytest process (CI teardown, harness killing a backgrounded suite) is
# silently swallowed and truncates whatever training loop happens to be
# running, failing that one test with a confusing short global_step
# (observed in practice). Default the handler OFF under pytest; the
# preemption tests opt back in via VSLNET_TEST_ALLOW_PREEMPT=1.
import vslnet_tpu.train.runner as _runner_mod  # noqa: E402

_orig_sigterm_flag = _runner_mod._sigterm_flag


def _test_sigterm_flag(enabled):
    allow = os.environ.get("VSLNET_TEST_ALLOW_PREEMPT") == "1"
    return _orig_sigterm_flag(enabled and allow)


_runner_mod._sigterm_flag = _test_sigterm_flag


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-second tests (subprocess smoke tests, interpreter-mode "
        "kernel sweeps); deselect with -m 'not slow' for a fast iteration "
        "loop",
    )


def pytest_sessionstart(session):
    n = jax.device_count()
    assert n == 8, (
        "tests require the simulated 8-device CPU platform, got %d %s devices"
        % (n, jax.devices()[0].platform)
    )
