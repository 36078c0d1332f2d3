"""Multi-chip production executor: DeviceTreeSolver sharded over a mesh.

The reference executes a level's joins serially
(/root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:1938-1993); they are
independent, so the device-resident executor shards the stacked level
programs over the pair axis (shard_map, "dp" levels) and the root-style
count==2 levels over the feature axis ("tp",
parallel/shard_solve.sharded_full_mixed). Run under the 8-virtual-device CPU
mesh (conftest).
"""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from synth import generate as gen
from linearsfm_tpu.core.device_tree import DeviceTreeSolver


def _mk(n, typ="stereo", seed=3):
    maps, _, _ = gen.make_dataset(n, typ, noise=0.01, seed=seed)
    return [m.to_local_map() for m in maps]


def _mesh(nd):
    return Mesh(np.array(jax.devices()[:nd]), ("pairs",))


def test_device_tree_dp_levels_bit_equal():
    """shard_map'd pair-axis levels reproduce the single-device tree exactly
    (same per-lane program; only the batch is split)."""
    lms = _mk(16)
    a = DeviceTreeSolver("stereo").run(lms)
    solver = DeviceTreeSolver("stereo", mesh=_mesh(2),
                              root_shard_min=1 << 30)
    # sanity: the plan actually contains dp levels under this mesh
    from linearsfm_tpu.core import plan as plan_mod, compact as compact_mod
    st = compact_mod.compact_stack(lms, solver.bucket, solver.u_bucket)
    tp = plan_mod.plan_tree_exact(plan_mod.sym_of_stacked(st), "stereo",
                                  solver.bucket, solver.u_bucket)
    modes = [solver._level_mode(lp, solver._level_key(lp)[1])
             for lp in tp.levels]
    assert modes.count("dp") >= 2, modes
    b = solver.run(lms)
    np.testing.assert_array_equal(np.asarray(a.pose_ids),
                                  np.asarray(b.pose_ids))
    np.testing.assert_array_equal(np.asarray(a.poses), np.asarray(b.poses))
    np.testing.assert_array_equal(np.asarray(a.feats), np.asarray(b.feats))


def test_device_tree_dp_odd_counts():
    """Odd, non-power-of-two level counts (the NC3500 shape: odd carry at
    every level, never divisible by 2*ndev) still engage dp via lane padding
    (clones dropped, carry handled outside the shard_map) and agree with the
    single-device tree exactly."""
    lms = _mk(11, seed=9)
    a = DeviceTreeSolver("stereo").run(lms)
    solver = DeviceTreeSolver("stereo", mesh=_mesh(2),
                              root_shard_min=1 << 30)
    from linearsfm_tpu.core import plan as plan_mod, compact as compact_mod
    st = compact_mod.compact_stack(lms, solver.bucket, solver.u_bucket)
    tp = plan_mod.plan_tree_exact(plan_mod.sym_of_stacked(st), "stereo",
                                  solver.bucket, solver.u_bucket)
    modes = solver._plan_modes(tp)
    counts = [lp.count for lp in tp.levels]
    assert not any(c % 4 == 0 for c in counts[:1]), counts  # truly odd start
    assert modes.count("dp") >= 2, (counts, modes)
    b = solver.run(lms)
    np.testing.assert_array_equal(np.asarray(a.pose_ids),
                                  np.asarray(b.pose_ids))
    np.testing.assert_array_equal(np.asarray(a.poses), np.asarray(b.poses))
    np.testing.assert_array_equal(np.asarray(a.feats), np.asarray(b.feats))


@pytest.mark.parametrize("typ,n", [("stereo", 8), ("mono", 9)])
def test_device_tree_tp_root(typ, n):
    """Feature-sharded root solve (psum partial S + sharded PCG matvec)
    agrees with the single-chip mixed solve; odd mono count also exercises
    the carry under a mesh."""
    lms = _mk(n, typ, seed=5)
    a = DeviceTreeSolver(typ).run(lms)
    solver = DeviceTreeSolver(typ, mesh=_mesh(2), root_shard_min=0)
    from linearsfm_tpu.core import plan as plan_mod, compact as compact_mod
    st = compact_mod.compact_stack(lms, solver.bucket, solver.u_bucket)
    tp = plan_mod.plan_tree_exact(plan_mod.sym_of_stacked(st), typ,
                                  solver.bucket, solver.u_bucket)
    modes = [solver._level_mode(lp, solver._level_key(lp)[1])
             for lp in tp.levels]
    assert "tp" in modes, modes
    b = solver.run(lms)
    np.testing.assert_array_equal(np.asarray(a.pose_ids),
                                  np.asarray(b.pose_ids))
    np.testing.assert_allclose(np.asarray(a.poses), np.asarray(b.poses),
                               atol=1e-8)
