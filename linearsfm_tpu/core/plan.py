"""Host-side capacity plan for the device-resident merge tree.

The device tree (core/device_tree.py) compiles one XLA program per level, so
every level's map capacities must be static before anything runs. This module
simulates the tree's count arithmetic from the initial per-map valid counts:

* join:      m = m1 + m2 (stereo; mono identifies ref+scap: m1 + m2 - 2),
             n <= n1 + n2, nU <= nU1' + nU2, nW <= nW1' + nW2,
             where (') includes the pre-join gauge transform growth
             (stereo: nU+m+1, nW+n — transform_map_stereo emission;
              mono: nU+2m+3, nW+2n — transform_map_mono emission).
* re-gauge:  same transform growth, applied at odd output positions
             (reference every-2nd-map re-gauge, LinearSFMImp.cpp:1997-2030).
* compact:   only shrinks (dedup/zero-drop), so the sums are upper bounds.

All bounds are exact for pose counts and conservative (no-dedup) for
feature/block counts; padding is zero-valued and semantically inert.
"""

from __future__ import annotations

import dataclasses

from .. import types


@dataclasses.dataclass(frozen=True)
class Counts:
    m: int   # valid poses
    n: int   # valid features
    nU: int  # nonzero U blocks
    nW: int  # nonzero W blocks


@dataclasses.dataclass(frozen=True)
class LevelPlan:
    count: int                    # maps entering this level
    caps_in: tuple[int, int, int, int]   # (M, N, KU, KW) of the level input
    caps_out: tuple[int, int, int, int]  # of the level output (= next input)


def _transform_growth(c: Counts, datatype: str) -> Counts:
    if datatype == "stereo":
        return Counts(c.m, c.n, c.nU + c.m + 1, c.nW + c.n)
    return Counts(c.m, c.n, c.nU + 2 * c.m + 3, c.nW + 2 * c.n)


def _join_counts(a: Counts, b: Counts, datatype: str) -> Counts:
    at = _transform_growth(a, datatype)
    if datatype == "stereo":
        m = a.m + b.m
    else:
        m = a.m + b.m - 2
    return Counts(m, a.n + b.n, at.nU + b.nU, at.nW + b.nW)


def _caps(counts: list[Counts], bucket: int, u_bucket: int):
    M = types.bucket(max(c.m for c in counts), bucket)
    N = types.bucket(max(c.n for c in counts), bucket)
    KU = types.bucket(max(c.nU for c in counts), u_bucket)
    KW = types.bucket(max(c.nW for c in counts), u_bucket)
    return (M, N, KU, KW)


def plan_tree(counts: list[Counts], datatype: str, bucket: int = 16,
              u_bucket: int = 64) -> list[LevelPlan]:
    """Level-by-level capacity plan for the whole merge tree."""
    plans = []
    while len(counts) > 1:
        count = len(counts)
        npair = count // 2
        nxt = (count + 1) // 2
        caps_in = _caps(counts, bucket, u_bucket)
        out = []
        for i in range(nxt):
            c = (_join_counts(counts[2 * i], counts[2 * i + 1], datatype)
                 if i < npair else counts[2 * i])
            if (i + 1) % 2 == 0:  # possible re-gauge growth before compact
                c = _transform_growth(c, datatype)
            out.append(c)
        caps_out = _caps(out, bucket, u_bucket)
        plans.append(LevelPlan(count, caps_in, caps_out))
        counts = out
    return plans


def counts_of(lm: types.LocalMap) -> Counts:
    """Valid counts of a host-compacted map (n_U/n_W are exact post-compact)."""
    return Counts(int(lm.n_poses), int(lm.n_feats), int(lm.n_U), int(lm.n_W))
