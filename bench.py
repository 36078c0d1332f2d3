"""Benchmark: end-to-end hierarchical stereo solve, maps-joined/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo bundles no data (Drive links only), so the bench runs on a
synthetic NC-style stereo sequence (see synth/generate.py). `vs_baseline`
compares against the single-threaded reference binary measured on the same
synthetic dataset on this host's CPU (tools/oracle); 0.0 until that
measurement exists in baseline_measured.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_MAPS = int(os.environ.get("BENCH_MAPS", "512"))
DTYPE = os.environ.get("BENCH_METHOD", "refine")
DATATYPE = os.environ.get("BENCH_TYPE", "stereo")
EXECUTOR = os.environ.get("BENCH_EXEC", "device")


def main():
    from synth import generate as gen
    import jax

    maps, poses_gt, _ = gen.make_dataset(NUM_MAPS, DATATYPE, noise=0.005, seed=7)
    lms = [m.to_local_map() for m in maps]

    if EXECUTOR == "device":
        from linearsfm_tpu.core.device_tree import DeviceTreeSolver
        solver = DeviceTreeSolver(DATATYPE, method=DTYPE)
    else:
        from linearsfm_tpu.core.tree import TreeSolver
        solver = TreeSolver(DATATYPE, method=DTYPE)
    # warmup: populate all per-level jit caches
    solver.run(lms)
    t0 = time.time()
    final = solver.run(lms)
    jax.block_until_ready(final.poses)
    wall = time.time() - t0

    import numpy as np
    ids = np.asarray(final.pose_ids)
    poses = np.asarray(final.poses)
    err = [float(np.linalg.norm(poses[s][:3] - poses_gt[int(i)][:3]))
           for s, i in enumerate(ids) if i >= 0]
    ate = float(np.sqrt(np.mean(np.square(err))))

    joins = NUM_MAPS - 1
    value = joins / wall

    base = 0.0
    bm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "baseline_measured.json")
    if os.path.exists(bm):
        with open(bm) as fh:
            b = json.load(fh).get(f"{DATATYPE}_maps_per_s_{NUM_MAPS}")
        if b:
            base = value / b

    print(json.dumps({
        "metric": f"synthetic {DATATYPE} {NUM_MAPS}-map hierarchical solve (ATE {ate:.2e})",
        "value": round(value, 3),
        "unit": "maps_joined/s",
        "vs_baseline": round(base, 3),
    }))


if __name__ == "__main__":
    main()
