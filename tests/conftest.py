import os

# The surrounding environment preloads JAX with the axon TPU plugin via
# sitecustomize (PYTHONPATH=/root/.axon_site) and sets JAX_PLATFORMS=axon, so
# env vars alone are too late here: jax is already imported when conftest runs.
# jax.config.update still works at any point before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
