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


def test_solve_full_mixed_matches_dense_f64():
    """f32-assembled Schur + f64 block-residual refinement == dense f64 solve."""
    import jax.numpy as jnp
    from linearsfm_tpu.ops import schur
    import helpers as H
    rng = np.random.default_rng(52)
    M, N = 12, 30
    U, Uij, W, Wpf, V = H.random_info_blocks(rng, M, N, obs_per_feat=4)
    d = 6 * M + 3 * N
    x_true = rng.standard_normal(d)
    I = np.zeros((d, d))
    for k, (i, j) in enumerate(Uij):
        I[6*i:6*i+6, 6*j:6*j+6] += U[k]
        if i != j:
            I[6*j:6*j+6, 6*i:6*i+6] += U[k].T
    for k, (p, f) in enumerate(Wpf):
        I[6*p:6*p+6, 6*M+3*f:6*M+3*f+3] += W[k]
        I[6*M+3*f:6*M+3*f+3, 6*p:6*p+6] += W[k].T
    for f in range(N):
        I[6*M+3*f:6*M+3*f+3, 6*M+3*f:6*M+3*f+3] += V[f]
    e = I @ x_true
    eP, eF = e[:6*M].reshape(M, 6), e[6*M:].reshape(N, 3)
    fixed = jnp.zeros(6 * M, bool)
    xp0, xf0, _ = schur.solve_full_mixed(
        jnp.asarray(U), jnp.asarray(Uij, jnp.int32), jnp.asarray(W),
        jnp.asarray(Wpf, jnp.int32), jnp.asarray(V), jnp.asarray(eP),
        jnp.asarray(eF), M, fixed, max_obs=8, iters=0)
    xp, xf, res = schur.solve_full_mixed(
        jnp.asarray(U), jnp.asarray(Uij, jnp.int32), jnp.asarray(W),
        jnp.asarray(Wpf, jnp.int32), jnp.asarray(V), jnp.asarray(eP),
        jnp.asarray(eF), M, fixed, max_obs=8, iters=4)
    got = np.concatenate([np.asarray(xp).ravel(), np.asarray(xf).ravel()])
    got0 = np.concatenate([np.asarray(xp0).ravel(), np.asarray(xf0).ravel()])
    e0 = np.abs(got0 - x_true).max()
    er = np.abs(got - x_true).max()
    assert er < 1e-9, (e0, er)
    assert er < e0 * 1e-2  # refinement actually contracts

    # dense-W assembly path (the device-resident tree's configuration)
    xpd, xfd, _ = schur.solve_full_mixed(
        jnp.asarray(U), jnp.asarray(Uij, jnp.int32), jnp.asarray(W),
        jnp.asarray(Wpf, jnp.int32), jnp.asarray(V), jnp.asarray(eP),
        jnp.asarray(eF), M, fixed, force_dense=True, iters=4)
    np.testing.assert_allclose(np.asarray(xpd), np.asarray(xp), atol=1e-9)
    np.testing.assert_allclose(np.asarray(xfd), np.asarray(xf), atol=1e-9)


def test_solve_full_mixed_pinned_coordinate():
    """The mono scale-pin: x[fixc] lands exactly at sign, others refined."""
    import jax.numpy as jnp
    from linearsfm_tpu.ops import schur
    import helpers as H
    rng = np.random.default_rng(53)
    M, N = 6, 14
    U, Uij, W, Wpf, V = H.random_info_blocks(rng, M, N, obs_per_feat=3)
    d = 6 * M + 3 * N
    x_true = rng.standard_normal(d)
    fixc, sign = 6 * 2 + 1, -1.0
    x_true[fixc] = sign
    I = np.zeros((d, d))
    for k, (i, j) in enumerate(Uij):
        I[6*i:6*i+6, 6*j:6*j+6] += U[k]
        if i != j:
            I[6*j:6*j+6, 6*i:6*i+6] += U[k].T
    for k, (p, f) in enumerate(Wpf):
        I[6*p:6*p+6, 6*M+3*f:6*M+3*f+3] += W[k]
        I[6*M+3*f:6*M+3*f+3, 6*p:6*p+6] += W[k].T
    for f in range(N):
        I[6*M+3*f:6*M+3*f+3, 6*M+3*f:6*M+3*f+3] += V[f]
    e = I @ x_true
    eP, eF = e[:6*M].reshape(M, 6), e[6*M:].reshape(N, 3)
    fixed = np.zeros(6 * M, bool)
    fixed[fixc] = True
    xp, xf, res = schur.solve_full_mixed(
        jnp.asarray(U), jnp.asarray(Uij, jnp.int32), jnp.asarray(W),
        jnp.asarray(Wpf, jnp.int32), jnp.asarray(V), jnp.asarray(eP),
        jnp.asarray(eF), M, jnp.asarray(fixed), max_obs=8, iters=4,
        fixc=fixc, sign=sign)
    got = np.concatenate([np.asarray(xp).ravel(), np.asarray(xf).ravel()])
    assert got[fixc] == sign
    np.testing.assert_allclose(got, x_true, atol=1e-8)


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


def test_solve_full_mixed_residual_and_escalation():
    """res_rel telemetry is real, and escalation == running the extra sweeps
    (same PCG recurrence, so the escalated result is bit-identical)."""
    import jax.numpy as jnp
    from linearsfm_tpu.ops import schur
    import helpers as H
    rng = np.random.default_rng(54)
    M, N = 10, 24
    U, Uij, W, Wpf, V = H.random_info_blocks(rng, M, N, obs_per_feat=4)
    d = 6 * M + 3 * N
    x_true = rng.standard_normal(d)
    I = np.zeros((d, d))
    for k, (i, j) in enumerate(Uij):
        I[6*i:6*i+6, 6*j:6*j+6] += U[k]
        if i != j:
            I[6*j:6*j+6, 6*i:6*i+6] += U[k].T
    for k, (p, f) in enumerate(Wpf):
        I[6*p:6*p+6, 6*M+3*f:6*M+3*f+3] += W[k]
        I[6*M+3*f:6*M+3*f+3, 6*p:6*p+6] += W[k].T
    for f in range(N):
        I[6*M+3*f:6*M+3*f+3, 6*M+3*f:6*M+3*f+3] += V[f]
    e = I @ x_true
    eP, eF = e[:6*M].reshape(M, 6), e[6*M:].reshape(N, 3)
    fixed = jnp.zeros(6 * M, bool)
    args = (jnp.asarray(U), jnp.asarray(Uij, jnp.int32), jnp.asarray(W),
            jnp.asarray(Wpf, jnp.int32), jnp.asarray(V), jnp.asarray(eP),
            jnp.asarray(eF), M, fixed)
    _, _, r0 = schur.solve_full_mixed(*args, max_obs=8, iters=0)
    xp4, xf4, r4 = schur.solve_full_mixed(*args, max_obs=8, iters=4)
    assert float(r4) < float(r0) * 1e-3      # PCG contracts the residual
    assert float(r4) < 1e-10                 # and reports convergence

    # escalation fires (tol=0 < any residual) and equals the straight run
    xpe, xfe, re_ = schur.solve_full_mixed(*args, max_obs=8, iters=1,
                                           escalate_iters=3,
                                           escalate_tol=0.0)
    np.testing.assert_array_equal(np.asarray(xpe), np.asarray(xp4))
    np.testing.assert_array_equal(np.asarray(xfe), np.asarray(xf4))
    np.testing.assert_array_equal(np.asarray(re_), np.asarray(r4))

    # a satisfied tolerance skips the extra sweeps
    xp1, _, r1 = schur.solve_full_mixed(*args, max_obs=8, iters=1)
    xps, _, rs = schur.solve_full_mixed(*args, max_obs=8, iters=1,
                                        escalate_iters=3, escalate_tol=1e30)
    np.testing.assert_array_equal(np.asarray(xps), np.asarray(xp1))
    np.testing.assert_array_equal(np.asarray(rs), np.asarray(r1))

    # early exit (exit_tol > 0): stops at the FIRST sweep count whose
    # residual satisfies the tolerance, bit-identical to the fixed-trip run
    # of that length (same recurrence, while_loop just stops earlier)
    tol = 1e-10
    xpw, xfw, rw = schur.solve_full_mixed(*args, max_obs=8, iters=16,
                                          exit_tol=tol)
    assert float(rw) <= tol
    for k in range(17):
        xpk, xfk, rk = schur.solve_full_mixed(*args, max_obs=8, iters=k)
        if float(rk) <= tol:
            break
    assert k < 16, "test system should converge before the cap"
    np.testing.assert_array_equal(np.asarray(xpw), np.asarray(xpk))
    np.testing.assert_array_equal(np.asarray(xfw), np.asarray(xfk))
    np.testing.assert_array_equal(np.asarray(rw), np.asarray(rk))
