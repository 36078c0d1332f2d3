"""Dense planned executor: equivalence with the host-driven scheduler.

DenseTreeSolver (core/dense_tree.py) executes the same tree as TreeSolver —
pairwise joins, odd carry (reference lmj_PF3D_Divide_Conquer*,
LinearSFMImp.cpp:1946-1948), every-2nd-output re-gauge (:1997-2030), final
re-gauge (:2039-2063) — with all layout bookkeeping host-planned
(core/layout.py) and the value algebra dense (ops/dense.py). Exactness is
method="direct" in f64; the mixed refine path is bounded against direct.
"""

import numpy as np
import pytest

from synth import generate as gen
from linearsfm_tpu.core import layout as L
from linearsfm_tpu.core import compact as compact_mod
from linearsfm_tpu.core.dense_tree import DenseTreeSolver
from linearsfm_tpu.core.tree import TreeSolver


def _by_id(ids, vals):
    return {int(i): np.asarray(vals)[s]
            for s, i in enumerate(np.asarray(ids)) if i >= 0}


@pytest.mark.parametrize("typ,n", [
    ("stereo", 8),  # power-of-two: no carry, the production bench shape class
    pytest.param("stereo", 16, marks=pytest.mark.slow),
    pytest.param("mono", 16, marks=pytest.mark.slow),
    ("stereo", 13), ("mono", 11)])
def test_dense_tree_matches_host_tree(typ, n):
    """Odd map counts exercise the carry path at several levels."""
    maps, _, _ = gen.make_dataset(n, typ, noise=0.01, seed=5)
    lms = [m.to_local_map() for m in maps]
    a = TreeSolver(typ, method="direct").run(lms)
    b = DenseTreeSolver(typ, method="direct").run(lms)
    pa, pb = _by_id(a.pose_ids, a.poses), _by_id(b.pose_ids, b.poses)
    assert set(pa) == set(pb)
    for k in pa:
        np.testing.assert_allclose(pa[k], pb[k], atol=1e-9)
    fa, fb = _by_id(a.feat_ids, a.feats), _by_id(b.feat_ids, b.feats)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(fa[k], fb[k], atol=1e-9)


def test_dense_tree_refine_close_to_direct_small():
    """Fast refine-vs-direct coverage (the 24-map 3-run variant is slow)."""
    maps, _, _ = gen.make_dataset(12, "stereo", noise=0.01, seed=9)
    lms = [m.to_local_map() for m in maps]
    a = DenseTreeSolver("stereo", method="direct").run(lms)
    b = DenseTreeSolver("stereo", method="refine", mixed_max_m=0).run(lms)
    pa, pb = _by_id(a.pose_ids, a.poses), _by_id(b.pose_ids, b.poses)
    assert set(pa) == set(pb)
    err = max(float(np.abs(pa[k] - pb[k]).max()) for k in pa)
    assert err < 1e-6, err


@pytest.mark.slow
@pytest.mark.parametrize("typ,policy_atol", [("stereo", 1e-2),
                                             ("mono", 2e-2)])
def test_dense_tree_refine_close_to_direct(typ, policy_atol):
    """Mixed-precision policy: low tree levels f32, refined upper levels."""
    maps, _, _ = gen.make_dataset(24, typ, noise=0.01, seed=9)
    lms = [m.to_local_map() for m in maps]
    a = DenseTreeSolver(typ, method="direct").run(lms)
    # pure f32-factor + f64-refinement (no mixed f32-info levels): tight
    b = DenseTreeSolver(typ, method="refine", mixed_max_m=0).run(lms)
    pa, pb = _by_id(a.pose_ids, a.poses), _by_id(b.pose_ids, b.poses)
    assert set(pa) == set(pb)
    err = max(float(np.abs(pa[k] - pb[k]).max()) for k in pa)
    assert err < 1e-6, err
    # default mixed policy: bound is ~cond * eps_f32 carried through the
    # low-level linearization points, far below the 1e-2 measurement noise
    c = DenseTreeSolver(typ, method="refine").run(lms)
    pc = _by_id(c.pose_ids, c.poses)
    err = max(float(np.abs(pa[k] - pc[k]).max()) for k in pa)
    assert err < policy_atol, err


def test_layout_plan_is_exact():
    """Planner layouts reproduce the actual id sets per level (stereo)."""
    maps, _, _ = gen.make_dataset(9, "stereo", noise=0.01, seed=2)
    lms = [compact_mod.compact(m.to_local_map(), 1, 1) for m in maps]
    layouts = [L.layout_of(lm) for lm in lms]
    plan = L.plan_dense_tree(layouts, "stereo", bucket=16)
    # replay the host scheduler and compare pose-id sets at the root
    final = TreeSolver("stereo", method="direct").run(
        [m.to_local_map() for m in maps])
    pid = np.asarray(final.pose_ids)
    assert set(int(x) for x in pid[pid >= 0]) == set(
        int(x) for x in plan.root.pose_ids)
    fid = np.asarray(final.feat_ids)
    assert set(int(x) for x in fid[fid >= 0]) == set(
        int(x) for x in plan.root.feat_ids)
