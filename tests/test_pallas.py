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


def _dense_ref(rows, cols, vals, M, N):
    K, R, C = vals.shape
    out = np.zeros((R * M, C * N), vals.dtype)
    for k in range(K):
        if rows[k] >= 0:
            out[rows[k]*R:(rows[k]+1)*R, cols[k]*C:(cols[k]+1)*C] += vals[k]
    return out


def test_blockcoo_to_dense_63():
    rng = np.random.default_rng(41)
    M, N, K = 37, 53, 700
    rows = rng.integers(0, M, K).astype(np.int32)
    rows[::13] = -1  # padding entries skipped
    cols = rng.integers(0, N, K).astype(np.int32)
    vals = rng.normal(size=(K, 6, 3)).astype(np.float32)
    got = pk.blockcoo_to_dense(jnp.asarray(rows), jnp.asarray(cols),
                               jnp.asarray(vals), M, N, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  _dense_ref(rows, cols, vals, M, N))


def test_blockcoo_to_dense_66():
    rng = np.random.default_rng(42)
    M, K = 29, 500
    rows = np.sort(rng.integers(0, M, K)).astype(np.int32)
    cols = rng.integers(0, M, K).astype(np.int32)
    vals = rng.normal(size=(K, 6, 6)).astype(np.float32)
    got = pk.blockcoo_to_dense(jnp.asarray(rows), jnp.asarray(cols),
                               jnp.asarray(vals), M, M, interpret=True)
    np.testing.assert_array_equal(np.asarray(got),
                                  _dense_ref(rows, cols, vals, M, M))


def test_dense_assembly_feature_chunked(monkeypatch):
    """The chunked [6M,3Nc] stripe path (NC3500/4096-root HBM budget) equals
    the single-shot dense assembly."""
    import numpy as np
    import jax.numpy as jnp
    from linearsfm_tpu.ops import schur

    rng = np.random.default_rng(77)
    M, N, KU, KW = 7, 23, 12, 40
    U = rng.standard_normal((KU, 6, 6)).astype(np.float32)
    Uij = np.sort(rng.integers(0, M, (KU, 2)), axis=1).astype(np.int32)
    # diagonal information blocks are symmetric in real data; the two dense
    # paths differ only in which convention they keep for asymmetric ones
    dg = Uij[:, 0] == Uij[:, 1]
    U[dg] = 0.5 * (U[dg] + np.swapaxes(U[dg], 1, 2))
    W = rng.standard_normal((KW, 6, 3)).astype(np.float32)
    Wpf = np.stack([rng.integers(0, M, KW),
                    rng.integers(0, N, KW)], axis=1).astype(np.int32)
    Vinv = rng.standard_normal((N, 3, 3)).astype(np.float32)
    eP = rng.standard_normal((M, 6)).astype(np.float32)
    eF = rng.standard_normal((N, 3)).astype(np.float32)

    args = (jnp.asarray(U), jnp.asarray(Uij), jnp.asarray(W),
            jnp.asarray(Wpf), jnp.asarray(Vinv), jnp.asarray(eP),
            jnp.asarray(eF), M)
    S0, E0 = schur._assemble_schur_dense(*args)
    monkeypatch.setattr(schur, "_DENSE_W_BYTES", 6 * M * 3 * 8 * 4)  # ~3 chunks
    S1, E1 = schur._assemble_schur_dense(*args)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S0), atol=1e-3)
    np.testing.assert_allclose(np.asarray(E1), np.asarray(E0), atol=1e-4)
