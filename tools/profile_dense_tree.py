"""Wall-clock of the dense planned executor (core/dense_tree.py) on TPU.

Usage: python tools/profile_dense_tree.py [NUM_MAPS] [stereo|mono] [method]
Prints cold/warm walls + the plan/densify/levels/get split, then per-level
dispatch walls.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 512
TYP = sys.argv[2] if len(sys.argv) > 2 else "stereo"
METHOD = sys.argv[3] if len(sys.argv) > 3 else "refine"


def main():
    import jax
    from synth import generate as gen
    from linearsfm_tpu.core.dense_tree import DenseTreeSolver

    t0 = time.time()
    maps, _, _ = gen.make_dataset(NUM, TYP, noise=0.005, seed=7)
    lms = [m.to_local_map() for m in maps]
    print(f"[{time.time()-t0:7.2f}s] dataset ready ({NUM} {TYP})", flush=True)

    solver = DenseTreeSolver(TYP, method=METHOD)
    for label in ("cold", "warm", "warm2"):
        t1 = time.time()
        out = solver.run(lms)
        w = time.time() - t1
        print(f"{label}: {w:7.2f}s ({(NUM-1)/w:7.1f} maps/s) "
              f"timing={solver._last_timing}", flush=True)


if __name__ == "__main__":
    main()
