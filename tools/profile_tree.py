"""Per-level wall-clock profile of the hierarchical solve.

Usage: python tools/profile_tree.py [NUM_MAPS] [stereo|mono] [method]

Prints one line per tree level: pair count, capacities, prep/device/get split
(from TreeSolver._last_timing) plus the host-side level wall time — the tool
for localizing whether time goes to compilation, device compute, transfers,
or host compaction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 512
TYP = sys.argv[2] if len(sys.argv) > 2 else "stereo"
METHOD = sys.argv[3] if len(sys.argv) > 3 else "direct"


def run_once(solver, lms, t0, label):
    from linearsfm_tpu.core import compact as compact_mod
    import jax
    maps = [compact_mod.compact(lm, solver.bucket, solver.u_bucket) for lm in lms]
    count = len(maps)
    level = 0
    while count > 1:
        lt0 = time.time()
        nxt = (count + 1) // 2
        npair = count // 2
        if npair > 1:
            merged = solver._run_level_batched(
                [maps[2 * i] for i in range(npair)],
                [maps[2 * i + 1] for i in range(npair)])
        else:
            merged = [solver.merge_pair(maps[0], maps[1])]
        jt = time.time()
        out = []
        for i in range(nxt):
            g = merged[i] if i < npair else maps[2 * i]
            if (i + 1) % 2 == 0:
                g = solver.regauge_to_final(g)
            g = compact_mod.compact(g, solver.bucket, solver.u_bucket)
            out.append(g)
        maps = out
        count = nxt
        level += 1
        st = compact_mod.stats(maps[0])
        tm = getattr(solver, "_last_timing", {})
        print(f"[{time.time()-t0:8.2f}s] {label} L{level:2d} npair={npair:4d} "
              f"join={jt-lt0:7.2f}s regauge+compact={time.time()-jt:7.2f}s "
              f"timing={tm} map0={st}", flush=True)
    g = solver.regauge_to_final(maps[0])
    jax.block_until_ready(g.poses)
    print(f"[{time.time()-t0:8.2f}s] {label} done", flush=True)


def main():
    from synth import generate as gen
    from linearsfm_tpu.core.tree import TreeSolver
    import time as _t

    t0 = time.time()
    maps, _, _ = gen.make_dataset(NUM, TYP, noise=0.005, seed=7)
    lms = [m.to_local_map() for m in maps]
    print(f"[{time.time()-t0:8.2f}s] dataset ready ({NUM} {TYP} maps)", flush=True)

    solver = TreeSolver(TYP, method=METHOD)
    run_once(solver, lms, t0, "cold")
    w0 = _t.time()
    run_once(solver, lms, t0, "warm")
    print(f"WARM TOTAL: {_t.time()-w0:.2f}s "
          f"({(NUM-1)/(_t.time()-w0):.1f} maps/s)", flush=True)


if __name__ == "__main__":
    main()
