"""Checkpoint/resume: a run resumed from any level reproduces the full run."""

import numpy as np

import helpers as H  # noqa: F401
from synth import generate as gen
from linearsfm_tpu.core.tree import TreeSolver
from linearsfm_tpu.utils import checkpoint as ckpt
from linearsfm_tpu.utils.metrics import LevelMetrics


def test_checkpoint_resume(tmp_path):
    maps, poses_gt, _ = gen.make_dataset(8, "stereo", noise=0.01, seed=9)
    lms = [m.to_local_map() for m in maps]

    m1 = LevelMetrics()
    solver = TreeSolver("stereo")
    full = solver.run(lms, ckpt_dir=str(tmp_path), metrics=m1)
    assert m1.total_joins == 7
    assert len(m1.records) == 3

    # wipe the in-memory state; resume from the saved level-2 checkpoint
    state = ckpt.latest(str(tmp_path))
    assert state is not None

    solver2 = TreeSolver("stereo")
    resumed = solver2.run([], ckpt_dir=str(tmp_path), resume=True)
    np.testing.assert_allclose(np.asarray(resumed.poses),
                               np.asarray(full.poses), atol=1e-12)


def test_device_checkpoint_resume(tmp_path):
    """Device executor: stacked level-boundary snapshots restart the tree."""
    import json
    import os
    from linearsfm_tpu.core.device_tree import DeviceTreeSolver

    maps, _, _ = gen.make_dataset(8, "stereo", noise=0.01, seed=9)
    lms = [m.to_local_map() for m in maps]

    s1 = DeviceTreeSolver("stereo")
    full = s1.run(lms, ckpt_dir=str(tmp_path))
    state = ckpt.latest_stacked(str(tmp_path))
    assert state is not None and state[0] == 3  # 8 -> 4 -> 2 -> 1

    # resume with all levels done: only the final program re-runs
    s2 = DeviceTreeSolver("stereo")
    resumed = s2.run(lms, ckpt_dir=str(tmp_path), resume=True)
    np.testing.assert_allclose(np.asarray(resumed.poses),
                               np.asarray(full.poses), atol=1e-12)

    # rewind the manifest to level 2: levels 2.. re-execute from the snapshot
    with open(os.path.join(str(tmp_path), "stacked_manifest.json"), "w") as fh:
        json.dump(dict(level=2), fh)
    s3 = DeviceTreeSolver("stereo")
    resumed2 = s3.run(lms, ckpt_dir=str(tmp_path), resume=True)
    np.testing.assert_allclose(np.asarray(resumed2.poses),
                               np.asarray(full.poses), atol=1e-12)

    # a shape-mismatched checkpoint is rejected, not silently used
    maps2, _, _ = gen.make_dataset(16, "stereo", noise=0.01, seed=9)
    lms2 = [m.to_local_map() for m in maps2]
    s4 = DeviceTreeSolver("stereo")
    out = s4.run(lms2, ckpt_dir=str(tmp_path), resume=True)
    assert int(out.n_poses) == 16  # full restart (per-map ref poses implicit)
