import os

# The surrounding environment preloads JAX with the axon TPU plugin via
# sitecustomize (PYTHONPATH=/root/.axon_site) and sets JAX_PLATFORMS=axon, so
# env vars alone are too late here: jax is already imported when conftest runs.
# jax.config.update still works at any point before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# No persistent compilation cache for tests: XLA:CPU cache keys don't include
# host machine features, so entries AOT-compiled in an earlier container can
# load here with mismatched ISA (loud cpu_aot_loader errors, SIGILL risk).
# CPU compiles are fast; correctness tests must never execute foreign code.
# (linearsfm_tpu/__init__.py reads this env var before configuring the cache.)
os.environ["LINEARSFM_JAX_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
