"""Multi-host tree execution: host-local subtrees + replicated top levels.

Asserts the multi-host decomposition (parallel/multihost.py) reproduces the
single-process solve — first in-process (transport stubbed), then with REAL
jax.distributed two-process CPU execution and a process_allgather over the
coordination service.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import helpers as H  # noqa: F401
from synth import generate as gen
from linearsfm_tpu.core.device_tree import DeviceTreeSolver
from linearsfm_tpu.parallel import multihost as MH

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dataset(n=8, datatype="stereo"):
    maps, poses_gt, _ = gen.make_dataset(n, datatype, noise=0.01, seed=3,
                                         covis_radius=3.0, covis_max=4)
    return [m.to_local_map() for m in maps], poses_gt


def _poses_by_id(final):
    ids = np.asarray(final.pose_ids)
    poses = np.asarray(final.poses)
    return {int(i): poses[k] for k, i in enumerate(ids) if i >= 0}


@pytest.mark.parametrize("datatype", [
    "stereo", pytest.param("mono", marks=pytest.mark.slow)])
def test_multihost_matches_single_process(datatype):
    # method="direct" (full f64): the decomposition is then exact to
    # padding-order rounding (~1e-13); the refine path's f32 low levels
    # amplify padding differences to ~1e-5 and are covered separately.
    kw = dict(method="direct")
    lms, _ = _dataset(8, datatype)
    ref = _poses_by_id(DeviceTreeSolver(datatype, **kw).run(lms))

    n_hosts = 2
    caps = MH.common_root_caps(lms, datatype, n_hosts)
    roots = [MH._pad_root(
        MH.local_phase(lms, datatype, n_hosts, h, kw), caps)
        for h in range(n_hosts)]
    # hosts are symmetric after the gather (replicated top), so one suffices
    out = MH.run_multihost(lms, datatype, n_hosts=n_hosts, host_id=0,
                           gather=lambda _my: roots, solver_kw=kw)
    got = _poses_by_id(out)
    assert got.keys() == ref.keys()
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-10,
                                   err_msg=f"pose {k}")


def test_multihost_two_processes(tmp_path):
    """REAL multi-process run: 2 CPU processes, jax.distributed + allgather."""
    script = os.path.join(REPO, "tools", "multihost_worker.py")
    port = 12391
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4",
                   LINEARSFM_JAX_CACHE="0")
        procs.append(subprocess.Popen(
            [sys.executable, script, f"127.0.0.1:{port}", "2", str(pid),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True))
    outs = [p.communicate(timeout=420)[0] for p in procs]
    for pid, p in enumerate(procs):
        assert p.returncode == 0, f"worker {pid} failed:\n{outs[pid][-3000:]}"

    lms, _ = _dataset(8, "stereo")
    ref = _poses_by_id(DeviceTreeSolver("stereo", method="direct").run(lms))
    for pid in range(2):
        f = np.load(tmp_path / f"result_{pid}.npz")
        got = {int(i): p for i, p in zip(f["ids"], f["poses"])}
        assert got.keys() == ref.keys()
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], atol=1e-10,
                                       err_msg=f"process {pid} pose {k}")
