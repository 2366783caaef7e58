"""Test configuration: force an 8-device virtual CPU platform.

The multi-chip sharding tests run on a virtual CPU mesh (the TPU-world
analogue of the reference's serial/mpi twin backends, SURVEY §4.1);
physics tests run on the same platform in float64 where needed.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: env may preset a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the
# config update is what actually forces the CPU backend (needed for the
# 8-virtual-device mesh and true float64).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: the model-step graphs take minutes to
# compile on the CPU backend; cache them across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/cice4_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def gx3_grid():
    import jax.numpy as jnp
    from cice4_tpu.config import gx3_config
    from cice4_tpu.grid import make_grid

    return make_grid(gx3_config(), dtype=jnp.float64)


@pytest.fixture(scope="session")
def gx3_cfg():
    from cice4_tpu.config import gx3_config

    return gx3_config()
