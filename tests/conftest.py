import os

# must be set before jax import: 8 virtual CPU devices for sharding tests,
# fp64 for parity/finite-difference checks
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# something in the pytest startup path imports jax._src before this conftest
# runs, freezing the env-var default -- set the config explicitly too
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
