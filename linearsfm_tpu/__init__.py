"""linearsfm-tpu: a TPU-native Linear SFM engine (JAX/XLA/Pallas).

A from-scratch rebuild of the hierarchical linear structure-from-motion solver
(reference: LiangZhaoPKUImperial/LinearSFM, C++/CHOLMOD, single-threaded CPU)
designed for TPU: batched block tensors, autodiff gauge Jacobians, MXU dense
Schur solves, shard_map map-parallel merge trees.

Double precision is required for information-matrix fusion; we enable x64 at
import (the reference is entirely double precision,
/root/reference/linux/src/LinearSFMImp/LinearSFMImp.h:110-120).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)
# Information-matrix products must not be demoted on the MXU (the default
# TPU matmul precision costs ~1e-5 relative error in f64 congruences).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the axon TPU tunnel's remote compile costs
# 30-60s per program (vs ~2s of actual XLA work); caching makes it one-time.
_cache = os.environ.get(
    "LINEARSFM_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
if _cache and _cache != "0":
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .types import LocalMap, Gauge  # noqa: E402,F401
from .version import __version__  # noqa: E402,F401
