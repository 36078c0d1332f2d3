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
