"""Map-parallel level execution: N-device mesh == serial results."""

import numpy as np
import jax
from jax.sharding import Mesh

import helpers as H  # noqa: F401  (side effect: path setup in conftest)
from synth import generate as gen
from linearsfm_tpu.core import compact as CPT, join as join_mod
from linearsfm_tpu.core.tree import TreeSolver
from linearsfm_tpu.parallel import level as plevel


def test_level_merge_matches_serial():
    maps, poses_gt, _ = gen.make_dataset(8, "stereo", noise=0.005, seed=3)
    lms = [CPT.compact(m.to_local_map()) for m in maps]
    cfg = join_mod.JoinConfig(max_obs=8)

    # serial level 0
    solver = TreeSolver("stereo")
    serial = [solver.merge_pair(lms[2 * i], lms[2 * i + 1]) for i in range(4)]

    # parallel level 0 over a 4-device mesh
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("pairs",))
    par = plevel.run_level([lms[2 * i] for i in range(4)],
                           [lms[2 * i + 1] for i in range(4)],
                           "stereo", cfg, mesh)

    for s, p in zip(serial, par):
        np.testing.assert_allclose(np.asarray(s.poses), np.asarray(p.poses),
                                   atol=1e-9)
        np.testing.assert_allclose(np.asarray(s.feats), np.asarray(p.feats),
                                   atol=1e-9)
        assert int(s.gauge.ref) == int(p.gauge.ref)


def test_level_merge_mono():
    maps, poses_gt, _ = gen.make_dataset(4, "mono", noise=0.0, seed=4)
    lms = [CPT.compact(m.to_local_map()) for m in maps]
    cfg = join_mod.JoinConfig(max_obs=12)
    devs = np.array(jax.devices()[:2])
    mesh = Mesh(devs, ("pairs",))
    par = plevel.run_level([lms[0], lms[2]], [lms[1], lms[3]], "mono", cfg, mesh)
    solver = TreeSolver("mono")
    serial = [solver.merge_pair(lms[0], lms[1]), solver.merge_pair(lms[2], lms[3])]
    for s, p in zip(serial, par):
        np.testing.assert_allclose(np.asarray(s.poses), np.asarray(p.poses), atol=1e-9)
