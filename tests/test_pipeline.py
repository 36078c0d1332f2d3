"""End-to-end merge tree on synthetic data.

With zero measurement noise every local map's state is exactly consistent, so
the linear fusion must reproduce the ground truth exactly (the problem is
linear: no iteration, no initial guess). With noise the result must stay
finite and close.
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from linearsfm_tpu.core.tree import TreeSolver
from synth import generate as gen


def _run(datatype, num_maps, noise=0.0, seed=0, **kw):
    maps, poses_gt, feats_gt = gen.make_dataset(num_maps, datatype, noise=noise,
                                                seed=seed)
    solver = TreeSolver(datatype, **kw)
    out = solver.run([m.to_local_map() for m in maps])
    ids = np.asarray(out.pose_ids)
    poses = np.asarray(out.poses)
    got = {int(i): poses[s] for s, i in enumerate(ids) if i >= 0}
    return out, got, poses_gt, feats_gt


def test_stereo_tree_exact():
    out, got, poses_gt, _ = _run("stereo", 6)
    assert int(out.gauge.ref) == 0
    # pose 0 is the implicit reference; all others must match ground truth
    for pid, val in got.items():
        np.testing.assert_allclose(val, poses_gt[pid], atol=1e-6,
                                   err_msg=f"pose {pid}")
    assert set(got) == set(range(1, 7 + 1 - 1))  # poses 1..6


def test_stereo_tree_odd_count():
    out, got, poses_gt, _ = _run("stereo", 5)
    for pid, val in got.items():
        np.testing.assert_allclose(val, poses_gt[pid], atol=1e-6)


def test_stereo_tree_noisy_finite():
    out, got, poses_gt, _ = _run("stereo", 8, noise=0.01)
    errs = [np.linalg.norm(got[p][:3] - poses_gt[p][:3]) for p in got]
    assert np.isfinite(errs).all()
    assert np.median(errs) < 0.5


def test_mono_tree_exact():
    out, got, poses_gt, _ = _run("mono", 6)
    assert int(out.gauge.ref) == 0
    # ref pose (0) is explicit and exactly zero
    np.testing.assert_allclose(got[0], 0.0, atol=0)
    for pid, val in got.items():
        np.testing.assert_allclose(val, poses_gt[pid], atol=1e-6,
                                   err_msg=f"pose {pid}")


def test_mono_tree_noisy_finite():
    out, got, poses_gt, _ = _run("mono", 7, noise=0.005)
    errs = [np.linalg.norm(got[p][:3] - poses_gt[p][:3]) for p in got]
    assert np.isfinite(errs).all()
    assert np.median(errs) < 0.5
