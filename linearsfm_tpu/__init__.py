"""linearsfm-tpu: a TPU-native Linear SFM engine (JAX/XLA/Pallas).

A from-scratch rebuild of the hierarchical linear structure-from-motion solver
(reference: LiangZhaoPKUImperial/LinearSFM, C++/CHOLMOD, single-threaded CPU)
designed for TPU: batched block tensors, autodiff gauge Jacobians, MXU dense
Schur solves, shard_map map-parallel merge trees.

Double precision is required for information-matrix fusion; we enable x64 at
import (the reference is entirely double precision,
/root/reference/linux/src/LinearSFMImp/LinearSFMImp.h:110-120).
"""

import jax

jax.config.update("jax_enable_x64", True)

from .types import LocalMap, Gauge  # noqa: E402,F401
from .version import __version__  # noqa: E402,F401
