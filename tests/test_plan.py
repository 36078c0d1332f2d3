"""Capacity planning: the exact id-space tree simulation (core/plan.py).

plan_tree_exact shadows the scheduler in id space (which pose/feature ids and
which blocks each tree node holds, including the data-dependent `ref > fref`
re-gauge — an id comparison, reference LinearSFMImp.cpp:1997). Soundness:
every actual compacted map's valid counts must fit the symbolic node (caps are
upper bounds up to numerically-zero block drops). Tightness: the symbolic plan
must beat the no-dedup count plan wherever maps share features.
"""

import numpy as np
import pytest

from synth import generate as gen
from linearsfm_tpu.core import compact as compact_mod
from linearsfm_tpu.core import plan as plan_mod
from linearsfm_tpu.core.tree import TreeSolver


def _run_levels(lms, typ):
    """Replicate TreeSolver.run's level loop, yielding per-level outputs."""
    ts = TreeSolver(typ, strategy="serial")
    maps = [compact_mod.compact(lm, 16, 64) for lm in lms]
    outs = []
    while len(maps) > 1:
        npair = len(maps) // 2
        nxt = (len(maps) + 1) // 2
        out = []
        for i in range(nxt):
            g = (ts.merge_pair(maps[2 * i], maps[2 * i + 1])
                 if i < npair else maps[2 * i])
            if (i + 1) % 2 == 0:
                g = ts.regauge_to_final(g)
            out.append(compact_mod.compact(g, 16, 64))
        outs.append(out)
        maps = out
    return outs


@pytest.mark.parametrize("typ,n", [("stereo", 13), ("mono", 11)])
def test_plan_tree_exact_sound_and_tight(typ, n):
    maps, _, _ = gen.make_dataset(n, typ, noise=0.01, seed=7)
    lms = [compact_mod.compact(m.to_local_map(), 16, 64) for m in maps]
    syms = [plan_mod.sym_of(lm) for lm in lms]
    tp = plan_mod.plan_tree_exact(syms, typ, 16, 64)
    plans_exact = tp.levels
    plans_count = plan_mod.plan_tree(
        [plan_mod.counts_of(lm) for lm in lms], typ, 16, 64)

    # --- soundness: per-node actual counts <= symbolic counts -------------
    levels = _run_levels(lms, typ)
    cur = syms
    for lvl, actual in enumerate(levels):
        npair = len(cur) // 2
        nxt = []
        for i in range(len(actual)):
            s = (plan_mod._sym_join(cur[2 * i], cur[2 * i + 1], typ)
                 if i < npair else cur[2 * i])
            s, rg = plan_mod._sym_finish(s, i, typ)
            # the plan's per-position re-gauge flag matches the replay
            assert plans_exact[lvl].regauge[i] == rg, (typ, lvl, i)
            nxt.append(s)
            a, c = actual[i], s.counts()
            assert int(a.n_poses) <= c.m, (typ, lvl, i, "m")
            assert int(a.n_feats) <= c.n, (typ, lvl, i, "n")
            assert int(a.n_U) <= c.nU, (typ, lvl, i, "nU")
            assert int(a.n_W) <= c.nW, (typ, lvl, i, "nW")
            # pose ids are exact (no pose ever drops to zero information)
            pid = np.asarray(a.pose_ids)
            assert set(int(x) for x in pid[pid >= 0]) == s.P
        cur = nxt

    # --- root: the finished-root plan covers the final re-gauged map -------
    root = cur[0]
    assert tp.root_regauge == (root.ref > root.fref)
    if tp.root_regauge:
        root, _ = plan_mod._sym_finish(root, 1, typ)
    c = root.counts()
    Mc, Nc, KUc, KWc = tp.root_caps
    assert c.m <= Mc and c.n <= Nc and c.nU <= KUc and c.nW <= KWc

    # --- tightness: exact plan never exceeds the count plan, and dedup
    # actually bites on feature capacity at the upper levels ----------------
    assert len(plans_exact) == len(plans_count)
    for pe, pc in zip(plans_exact, plans_count):
        assert pe.count == pc.count
        assert all(e <= c for e, c in zip(pe.caps_out, pc.caps_out))
    # shared features along the trajectory => strictly smaller N at the root
    assert plans_exact[-1].caps_out[1] < plans_count[-1].caps_out[1]
