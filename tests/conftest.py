import os

# Tests run on the CPU backend with 8 virtual devices so multi-chip sharding
# paths are exercised without TPU hardware.  NOTE: this environment's
# sitecustomize imports jax at interpreter startup, so the env vars alone are
# too late — jax.config.update is required.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
