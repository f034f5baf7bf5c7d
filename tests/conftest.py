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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS handles it
jax.config.update("jax_threefry_partitionable", True)


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
