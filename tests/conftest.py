"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Per SURVEY.md §4, multi-device (data-parallel) logic is tested on a fake CPU
mesh via --xla_force_host_platform_device_count so the full sharding path
runs in CI without TPU hardware. This must happen before jax is imported.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# In-process CLI tests must not persist XLA programs into the developer's
# real ~/.cache or mutate global jax cache config for the pytest session.
os.environ["ANNONET_TPU_NO_COMPILATION_CACHE"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of where pytest is invoked from.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin pre-sets jax_platforms to "axon,cpu", overriding the
# environment variable — force CPU explicitly after import.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slower end-to-end tests")

