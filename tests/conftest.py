"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4)."""
import os

# must run before jax is used anywhere. NOTE: the axon TPU PJRT plugin is
# registered by a sitecustomize at interpreter startup, so env vars alone are
# too late — jax.config is the authoritative override.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def lego_root():
    path = "/root/reference/data/nerf_synthetic"
    if not os.path.exists(os.path.join(path, "lego")):
        pytest.skip("lego dataset not available")
    return path
