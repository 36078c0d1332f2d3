"""Pallas kernels vs jnp fallbacks (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

import helpers as H  # noqa: F401
from linearsfm_tpu.ops import schur
from linearsfm_tpu.ops import pallas_kernels as pk


def test_inv3x3_pallas_matches_fallback():
    rng = np.random.default_rng(40)
    A = rng.standard_normal((300, 3, 3))
    V = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.5 * np.eye(3))
    V = V.at[7].set(0.0)  # zero block stays zero
    ref = schur.inv3x3_sym(V)
    got = pk.inv3x3_sym(V, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-10)
