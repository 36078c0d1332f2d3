"""Solver precision paths: direct f64 vs f32+refinement."""

import numpy as np
import jax.numpy as jnp

import helpers as H  # noqa: F401
from linearsfm_tpu.ops import solve


def _spd(n, cond, rng):
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    w = np.logspace(0, np.log10(cond), n)
    return Q @ np.diag(w) @ Q.T


def test_refine_recovers_f64_accuracy():
    rng = np.random.default_rng(50)
    S = _spd(240, 1e6, rng)
    x_true = rng.standard_normal(240)
    E = S @ x_true

    x32 = np.asarray(solve.cholesky_solve_refine(jnp.asarray(S), jnp.asarray(E), iters=0))
    xr = np.asarray(solve.cholesky_solve_refine(jnp.asarray(S), jnp.asarray(E), iters=5))
    xd = np.asarray(solve.cholesky_solve(jnp.asarray(S), jnp.asarray(E)))

    e32 = np.abs(x32 - x_true).max()
    er = np.abs(xr - x_true).max()
    ed = np.abs(xd - x_true).max()
    # pure f32 is orders of magnitude worse; refinement closes the gap
    # (~100x error reduction per sweep at cond=1e6)
    assert e32 > 1e-4
    assert er < 1e-9
    assert ed < 1e-9


def test_mask_gauge_identity_rows():
    rng = np.random.default_rng(51)
    S = _spd(24, 1e3, rng)
    E = rng.standard_normal(24)
    fixed = np.zeros(24, bool)
    fixed[[3, 10, 11]] = True
    x = np.asarray(solve.solve_reduced(jnp.asarray(S), jnp.asarray(E),
                                       fixed_mask=jnp.asarray(fixed)))
    assert np.all(x[fixed] == 0)
    keep = ~fixed
    ref = np.zeros(24)
    ref[keep] = np.linalg.solve(S[np.ix_(keep, keep)], E[keep])
    np.testing.assert_allclose(x, ref, atol=1e-9)


def test_mono_tree_odd_count_exact():
    from synth import generate as gen
    from linearsfm_tpu.core.tree import TreeSolver
    maps, poses_gt, _ = gen.make_dataset(5, "mono", noise=0.0, seed=13)
    solver = TreeSolver("mono")
    out = solver.run([m.to_local_map() for m in maps])
    ids = np.asarray(out.pose_ids)
    poses = np.asarray(out.poses)
    for s, pid in enumerate(ids):
        if pid >= 0:
            np.testing.assert_allclose(poses[s], poses_gt[int(pid)], atol=1e-6)


def test_stereo_tree_refine_method():
    """f32-factor + f64-refinement through the whole pipeline."""
    from synth import generate as gen
    from linearsfm_tpu.core.tree import TreeSolver
    maps, poses_gt, _ = gen.make_dataset(8, "stereo", noise=0.0, seed=14)
    out = TreeSolver("stereo", method="refine", refine_iters=4).run(
        [m.to_local_map() for m in maps])
    ids = np.asarray(out.pose_ids)
    poses = np.asarray(out.poses)
    for s, pid in enumerate(ids):
        if pid >= 0:
            np.testing.assert_allclose(poses[s], poses_gt[int(pid)], atol=5e-5)


def test_grid_pattern_dataset():
    from synth import generate as gen
    from linearsfm_tpu.core.tree import TreeSolver
    maps, poses_gt, _ = gen.make_dataset(12, "stereo", noise=0.0, seed=15,
                                         pattern="grid")
    out = TreeSolver("stereo").run([m.to_local_map() for m in maps])
    ids = np.asarray(out.pose_ids)
    poses = np.asarray(out.poses)
    for s, pid in enumerate(ids):
        if pid >= 0:
            np.testing.assert_allclose(poses[s], poses_gt[int(pid)], atol=1e-6)
