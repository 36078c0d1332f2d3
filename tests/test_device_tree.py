"""Device-resident tree executor: equivalence with the host-driven scheduler.

The device tree (core/device_tree.py) must reproduce the host tree
(core/tree.py) — same join order, every-2nd-map re-gauge, odd carry, final
re-gauge (reference lmj_PF3D_Divide_Conquer*, LinearSFMImp.cpp:1926-2099,
:6511-6658) — while keeping all maps on device between levels.
"""

import jax
import numpy as np
import pytest

from synth import generate as gen
from linearsfm_tpu.core import compact as compact_mod
from linearsfm_tpu.core import dcompact
from linearsfm_tpu.core.device_tree import DeviceTreeSolver
from linearsfm_tpu.core.tree import TreeSolver


def _by_id(ids, vals):
    return {int(i): np.asarray(vals)[s]
            for s, i in enumerate(np.asarray(ids)) if i >= 0}


def _dense(lm):
    M, N = lm.M, lm.N
    A = np.zeros((6 * M, 6 * M))
    Wd = np.zeros((6 * M, 3 * N))
    U, Uij, W, Wpf = map(np.asarray, (lm.U, lm.Uij, lm.W, lm.Wpf))
    for k in range(lm.KU):
        i, j = Uij[k]
        A[6 * i:6 * i + 6, 6 * j:6 * j + 6] += U[k]
        if i != j:
            A[6 * j:6 * j + 6, 6 * i:6 * i + 6] += U[k].T
    for k in range(lm.KW):
        p, f = Wpf[k]
        Wd[6 * p:6 * p + 6, 3 * f:3 * f + 3] += W[k]
    return A, Wd


def test_compact_device_matches_host():
    maps, _, _ = gen.make_dataset(8, "stereo", noise=0.01, seed=3)
    lms = [compact_mod.compact(m.to_local_map(), 16, 64) for m in maps]
    ts = TreeSolver("stereo", strategy="serial")
    raw = ts.merge_pair(lms[0], lms[1])
    hc = compact_mod.compact(jax.device_get(raw), 16, 64)
    dc, max_obs = jax.jit(
        lambda lm: dcompact.compact_device(lm, hc.M, hc.N, hc.KU, hc.KW))(raw)

    assert np.array_equal(np.asarray(hc.pose_ids), np.asarray(dc.pose_ids))
    assert np.array_equal(np.asarray(hc.feat_ids), np.asarray(dc.feat_ids))
    assert int(hc.n_U) == int(dc.n_U) and int(hc.n_W) == int(dc.n_W)
    Ah, Wh = _dense(hc)
    Ad, Wd = _dense(dc)
    np.testing.assert_allclose(Ah, Ad, atol=1e-12)
    np.testing.assert_allclose(Wh, Wd, atol=1e-12)
    np.testing.assert_allclose(np.asarray(hc.V), np.asarray(dc.V), atol=1e-12)
    # max_obs: every feature in this synthetic set is seen by <= a few poses
    assert 1 <= int(max_obs) <= 8


@pytest.mark.parametrize("typ,n", [
    pytest.param("stereo", 16, marks=pytest.mark.slow),
    pytest.param("mono", 16, marks=pytest.mark.slow),
    ("stereo", 13), ("mono", 11)])
def test_device_tree_matches_host_tree(typ, n):
    """Odd map counts exercise the carry path at several levels."""
    maps, _, _ = gen.make_dataset(n, typ, noise=0.01, seed=5)
    lms = [m.to_local_map() for m in maps]
    a = TreeSolver(typ, method="direct").run(lms)
    b = DeviceTreeSolver(typ, method="direct").run(lms)
    pa, pb = _by_id(a.pose_ids, a.poses), _by_id(b.pose_ids, b.poses)
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=1e-9)
    fa, fb = _by_id(a.feat_ids, a.feats), _by_id(b.feat_ids, b.feats)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-9)


def test_device_tree_pcg_early_exit():
    """Top-band PCG early exit (pcg_exit_tol) through the tree executor:
    forcing every level into the top band (top_min_m tiny) with the exit
    enabled must agree with the fixed-trip solver to PCG-convergence
    accuracy — the exit fires only below a near-machine residual."""
    maps, _, _ = gen.make_dataset(9, "stereo", noise=0.01, seed=21)
    lms = [m.to_local_map() for m in maps]
    kw = dict(method="refine", top_min_m=4, top_iters=16)
    a = DeviceTreeSolver("stereo", pcg_exit_tol=0.0, **kw).run(lms)
    b = DeviceTreeSolver("stereo", pcg_exit_tol=1e-14, **kw).run(lms)
    pa, pb = _by_id(a.pose_ids, a.poses), _by_id(b.pose_ids, b.poses)
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=1e-9)


def test_device_tree_refine_close_to_direct():
    maps, _, _ = gen.make_dataset(16, "stereo", noise=0.01, seed=9)
    lms = [m.to_local_map() for m in maps]
    a = DeviceTreeSolver("stereo", method="direct").run(lms)
    # pure f32-factor + f64-refinement (no mixed f32-info levels): tight
    b = DeviceTreeSolver("stereo", method="refine", mixed_max_m=0).run(lms)
    pa, pb = _by_id(a.pose_ids, a.poses), _by_id(b.pose_ids, b.poses)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=1e-6)
    # default mixed policy (low levels carry f32 information): bound is
    # ~cond(S)*eps_f32 through the tree, not f64 round-off
    c = DeviceTreeSolver("stereo", method="refine").run(lms)
    pc = _by_id(c.pose_ids, c.poses)
    for k in pa:
        np.testing.assert_allclose(pa[k], pc[k], atol=2e-4)
