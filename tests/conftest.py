import os

# The surrounding environment preloads JAX with the axon TPU plugin via
# sitecustomize (PYTHONPATH=/root/.axon_site) and sets JAX_PLATFORMS=axon, so
# env vars alone are too late here: jax is already imported when conftest runs.
# jax.config.update still works at any point before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Don't use the repo's persistent cache (.jax_cache): XLA:CPU cache keys
# don't include host machine features, so entries AOT-compiled in an earlier
# container can load here with mismatched ISA (loud cpu_aot_loader errors,
# SIGILL risk). Correctness tests must never execute foreign code.
# (linearsfm_tpu/__init__.py reads this env var before configuring the cache.)
os.environ["LINEARSFM_JAX_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ... but a MACHINE-LOCAL cache under /tmp is safe (never leaves this host)
# and pays off twice: identical programs recompiled across solver instances
# within one run (every equivalence test builds >= 2 solvers), and full
# reruns. The big device-tree level programs cost 10-100s each to compile on
# CPU; this is the difference between a ~20 min and a ~5 min suite.
_cache = os.environ.get("LINEARSFM_TEST_CACHE",
                        "/tmp/linearsfm_jax_cpu_cache")
if _cache != "0":
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
