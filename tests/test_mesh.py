"""auto_solver on an 8-device mesh: full tree, mesh-parallel levels."""

import numpy as np

import helpers as H  # noqa: F401
from synth import generate as gen
from linearsfm_tpu.parallel import mesh as pmesh


def test_auto_solver_mesh_tree_exact():
    """Production (device) executor on the full 8-device mesh."""
    maps, poses_gt, _ = gen.make_dataset(16, "stereo", noise=0.0, seed=19)
    solver = pmesh.auto_solver("stereo", root_shard_min=32)
    assert solver.mesh is not None and solver.mesh.devices.size == 8
    out = solver.run([m.to_local_map() for m in maps])
    ids = np.asarray(out.pose_ids)
    poses = np.asarray(out.poses)
    for s, pid in enumerate(ids):
        if pid >= 0:
            np.testing.assert_allclose(poses[s], poses_gt[int(pid)], atol=1e-6)


def test_auto_solver_host_executor():
    """Legacy host-driven solver still constructible through auto_solver."""
    maps, poses_gt, _ = gen.make_dataset(8, "stereo", noise=0.0, seed=19)
    solver = pmesh.auto_solver("stereo", executor="host", root_shard_min=64)
    out = solver.run([m.to_local_map() for m in maps])
    ids = np.asarray(out.pose_ids)
    poses = np.asarray(out.poses)
    for s, pid in enumerate(ids):
        if pid >= 0:
            np.testing.assert_allclose(poses[s], poses_gt[int(pid)], atol=1e-6)
