"""Strong-baseline floor: what would the reference cost with a REAL sparse
solver instead of the dense-Cholesky shim?

The measured oracle (tools/oracle) understates real supernodal CHOLMOD above
~512 maps (BASELINE.md caveat). This probe bounds the gap from the honest
side: it times scipy's SuperLU (COLAMD ordering, supernodal-class kernels —
the same family as CHOLMOD) on reduced camera systems with the bench
dataset's exact co-observation pattern, at every tree-node size, and sums
them the way the reference's divide&conquer would pay them
(lmj_PF3D_Divide_ConquerStereo does one factorization per join,
/root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:1950-1992, :2444).

This floor IGNORES everything else the reference does per join (transform,
assembly, feature back-substitution, allocation) — it is a strict lower
bound on a CHOLMOD-quality reference implementation.

Usage: python tools/strong_floor.py [N=2048] [--json out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def coobservation_pairs(num_maps, datatype="stereo"):
    """(i, j) pose-pose coupling pairs of the bench dataset (covis on)."""
    from synth import generate as gen
    maps, _, _ = gen.make_dataset(num_maps, datatype, noise=0.005, seed=7,
                                  covis_radius=6.0, covis_max=6)
    # feature -> observing pose ids (global)
    from collections import defaultdict
    obs = defaultdict(set)
    for m in maps:
        pids = list(m.pose_ids) + [m.gauge["ref"]]
        for fid in m.feat_ids:
            obs[int(fid)].update(int(p) for p in pids)
    pairs = set()
    for ps in obs.values():
        ps = sorted(ps)
        for a in range(len(ps)):
            for b in range(a, len(ps)):
                pairs.add((ps[a], ps[b]))
    return pairs


def build_system(pairs, n_poses, rng):
    """Block 6x6 SPD system with the given block pattern (values irrelevant
    to SuperLU's cost: pattern + ordering drive the fill)."""
    rows, cols, vals = [], [], []
    r6 = np.arange(6)
    for (i, j) in pairs:
        if i >= n_poses or j >= n_poses:
            continue
        B = rng.standard_normal((6, 6)) * 0.1
        if i == j:
            B = B @ B.T + 12 * np.eye(6)
        rr = np.repeat(6 * i + r6, 6)
        cc = np.tile(6 * j + r6, 6)
        rows.append(rr), cols.append(cc), vals.append(B.reshape(-1))
        if i != j:
            rows.append(cc), cols.append(rr), vals.append(B.T.reshape(-1))
    A = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(6 * n_poses, 6 * n_poses)).tocsc()
    return A


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    num = int(args[0]) if args else 2048
    out = None
    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
    datatype = "mono" if "--mono" in sys.argv else "stereo"
    pairs = coobservation_pairs(num, datatype)
    rng = np.random.default_rng(0)

    rows = []
    total = 0.0
    m = num
    count = 1
    while m >= 64:
        # the level's joins each factor a system of ~m poses; pattern = the
        # dataset's co-observation graph restricted to the first m poses
        A = build_system(pairs, m + 1, rng)
        b = rng.standard_normal(A.shape[0])
        t0 = time.time()
        lu = spla.splu(A)
        lu.solve(b)
        dt = time.time() - t0
        level_cost = dt * count
        total += level_cost
        rows.append(dict(m=m, joins=count, factor_s=round(dt, 3),
                         level_s=round(level_cost, 3),
                         nnz=int(A.nnz), fill_nnz=int(lu.L.nnz + lu.U.nnz)))
        print(f"m={m:5d} joins={count:3d} splu={dt:7.3f}s "
              f"level={level_cost:8.3f}s nnz={A.nnz} "
              f"fill={lu.L.nnz + lu.U.nnz}", flush=True)
        m //= 2
        count *= 2
    print(f"FLOOR (sum of factorizations alone, sizes >= 64): {total:.1f}s "
          f"=> <= {(num - 1) / total:.1f} maps/s", flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(dict(num=num, type=datatype, floor_s=round(total, 2),
                           floor_maps_per_s=round((num - 1) / total, 2),
                           levels=rows), fh, indent=1)


if __name__ == "__main__":
    main()
