"""Multi-host hierarchical execution: host-local subtrees + replicated top.

The reference merge tree (lmj_PF3D_Divide_ConquerStereo/Mono,
/root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:1932-2035) is a
binary reduction over the map sequence; partitioning the sequence
CONTIGUOUSLY across hosts makes the bottom ``log2(chunk)`` levels exactly
host-local (zero cross-host traffic — the joins of a level never cross an
aligned power-of-two boundary), and only the top ``log2(n_hosts)`` levels
involve other hosts' data.

DCN policy for the top levels: ALL-GATHER the per-host subtree roots once and
run the top levels REPLICATED on every host. A compacted root map is small
(the information form is O(map blocks), not O(trajectory²)), so a single
allgather of P maps beats a log-depth pairwise exchange choreography, and
replication makes every host finish with bit-identical global state —
no broadcast step, no leader.

Exactness: the every-2nd-map re-gauge keys on the GLOBAL level position
(LinearSFMImp.cpp:1997), so the host-local phase plans its subtree with
``map_offset = host_id * chunk`` (core/plan.py) and skips the whole-tree root
re-gauge; the replicated top phase then reproduces the single-process
schedule exactly.

Transport: under ``jax.distributed`` the gather runs as
``multihost_utils.process_allgather`` over DCN; single-process callers (and
the virtual-mesh dry run) pass a trivial gather. The same code path serves
both — process boundaries only change the transport, never the math.
"""

from __future__ import annotations

import numpy as np

from .. import types
from ..core import plan as plan_mod
from ..core.device_tree import DeviceTreeSolver


def chunk_of(n_maps: int, n_hosts: int, host_id: int) -> tuple[int, int]:
    """Contiguous [lo, hi) map span owned by `host_id`.

    Requires n_maps divisible by n_hosts with a power-of-two chunk so the
    host-local subtree aligns with the global tree (plan.py map_offset).
    """
    assert n_maps % n_hosts == 0, (n_maps, n_hosts)
    chunk = n_maps // n_hosts
    assert chunk & (chunk - 1) == 0, f"chunk {chunk} must be a power of two"
    return host_id * chunk, (host_id + 1) * chunk


def local_phase(maps: list[types.LocalMap], datatype: str, n_hosts: int,
                host_id: int, solver_kw: dict | None = None
                ) -> types.LocalMap:
    """Run this host's subtree; returns the host-local root map."""
    lo, hi = chunk_of(len(maps), n_hosts, host_id)
    solver = DeviceTreeSolver(datatype, plan_offset=lo, final_regauge=False,
                              **(solver_kw or {}))
    return solver.run(maps[lo:hi])


def _pad_root(lm: types.LocalMap, caps) -> types.LocalMap:
    M, N, KU, KW = caps
    return lm.pad_to(M, N, KU, KW)


def common_root_caps(maps: list[types.LocalMap], datatype: str, n_hosts: int,
                     bucket: int = 16, u_bucket: int = 64):
    """Deterministic shared capacities for every host's subtree root.

    Each process derives this from the (identical) global map metadata, so
    the allgather exchanges equal-shaped buffers without a shape handshake.
    """
    caps = [1, 1, 1, 1]
    for h in range(n_hosts):
        lo, hi = chunk_of(len(maps), n_hosts, h)
        syms = [plan_mod.sym_of(m) for m in maps[lo:hi]]
        tp = plan_mod.plan_tree_exact(syms, datatype, bucket, u_bucket,
                                      map_offset=lo, final_regauge=False)
        rc = tp.root_caps if tp else (1, 1, 1, 1)
        caps = [max(a, b) for a, b in zip(caps, rc)]
    return tuple(caps)


def top_phase(roots: list[types.LocalMap], datatype: str,
              solver_kw: dict | None = None) -> types.LocalMap:
    """Replicated top levels over the gathered per-host roots."""
    solver = DeviceTreeSolver(datatype, **(solver_kw or {}))
    return solver.run(roots)


def run_multihost(maps: list[types.LocalMap], datatype: str,
                  n_hosts: int | None = None, host_id: int | None = None,
                  gather=None, solver_kw: dict | None = None
                  ) -> types.LocalMap:
    """Full multi-host solve from this process's perspective.

    gather(padded_root) -> list of all hosts' padded roots (host order).
    Defaults to jax.distributed transport (process_allgather); pass a custom
    gather for tests or single-process simulation.
    """
    import jax
    if n_hosts is None:
        n_hosts = jax.process_count()
    if host_id is None:
        host_id = jax.process_index()
    if n_hosts == 1:
        solver = DeviceTreeSolver(datatype, **(solver_kw or {}))
        return solver.run(maps)

    root = local_phase(maps, datatype, n_hosts, host_id, solver_kw)
    caps = common_root_caps(maps, datatype, n_hosts)
    padded = _pad_root(root, caps)

    if gather is None:
        from jax.experimental import multihost_utils

        def gather(lm):
            stacked = multihost_utils.process_allgather(
                jax.tree.map(np.asarray, lm))
            return [jax.tree.map(lambda a, i=i: a[i], stacked)
                    for i in range(n_hosts)]

    roots = gather(padded)
    return top_phase(roots, datatype, solver_kw)
