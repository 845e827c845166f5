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

# NOTE: the persistent compile cache is deliberately NOT enabled for the
# (CPU) test suite: deserializing XLA:CPU AOT executables across
# processes/machines SIGSEGVs (two reproduced crashes; see
# reactive_pb_nn_md_tpu/utils/cache.py).  Suite wall time is managed by
# keeping individual tests lean instead.
