"""Benchmark: end-to-end hierarchical stereo solve, maps-joined/s.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference repo bundles no data (Drive links only), so the bench runs on a
synthetic NC-style stereo sequence (see synth/generate.py). `vs_baseline`
compares against the single-threaded reference binary measured on the same
synthetic dataset on this host's CPU (tools/oracle; baseline_measured.json).

Cold-start design (the driver runs this with a timeout, possibly with a cold
XLA cache — the axon compile keys change across tunnel sessions):
* the first solver.run() AOT-compiles every tree-level program CONCURRENTLY
  (core/device_tree.py ensure_warm), so a fully cold 2048-map tree costs
  ~1 slowest-program compile (minutes), not the 20-minute sequential sum;
* progress goes to stderr so a timeout still leaves a diagnosable tail;
* the timed run is the second, fully warm pass (steady-state throughput,
  matching how the reference was timed: compute only, data pre-loaded).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_MAPS = int(os.environ.get("BENCH_MAPS", "2048"))
METHOD = os.environ.get("BENCH_METHOD", "refine")
DATATYPE = os.environ.get("BENCH_TYPE", "stereo")
EXECUTOR = os.environ.get("BENCH_EXEC", "device")
# Loop-closure co-visibility (default ON from r4): every bundled reference
# dataset revisits landmarks (/root/reference/README.txt:63-65); covis=0
# benches only the easy near-block-diagonal case. Matches the covis CPU
# oracle rows in baseline_measured.json (tools/measure_baseline.py).
COVIS = os.environ.get("BENCH_COVIS", "1") != "0"


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def build_solver():
    if EXECUTOR == "device":
        from linearsfm_tpu.core.device_tree import DeviceTreeSolver
        return DeviceTreeSolver(DATATYPE, method=METHOD)
    if EXECUTOR == "dense":
        from linearsfm_tpu.core.dense_tree import DenseTreeSolver
        return DenseTreeSolver(DATATYPE, method=METHOD)
    from linearsfm_tpu.core.tree import TreeSolver
    return TreeSolver(DATATYPE, method=METHOD)


def main():
    import numpy as np
    from synth import generate as gen
    import jax

    cov = dict(covis_radius=6.0, covis_max=6) if COVIS else {}
    log(f"dataset: {NUM_MAPS} {DATATYPE} maps (noise=0.005, seed=7, "
        f"covis={'on' if COVIS else 'off'})")
    maps, poses_gt, _ = gen.make_dataset(NUM_MAPS, DATATYPE, noise=0.005,
                                         seed=7, **cov)
    lms = [m.to_local_map() for m in maps]
    solver = build_solver()

    t0 = time.time()
    log(f"warmup run (AOT concurrent compile + first exec, exec={EXECUTOR})")
    final = solver.run(lms)
    jax.block_until_ready(final.poses)
    log(f"warmup done in {time.time() - t0:.1f}s "
        f"{getattr(solver, '_last_timing', '')}")

    t0 = time.time()
    final = solver.run(lms)
    jax.block_until_ready(final.poses)
    wall = time.time() - t0
    log(f"timed run: {wall:.2f}s")

    ids = np.asarray(final.pose_ids)
    poses = np.asarray(final.poses)
    err = [float(np.linalg.norm(poses[s][:3] - poses_gt[int(i)][:3]))
           for s, i in enumerate(ids) if i >= 0]
    ate = float(np.sqrt(np.mean(np.square(err))))

    joins = NUM_MAPS - 1
    value = joins / wall

    base = 0.0
    tag = "_covis" if COVIS else ""
    bm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "baseline_measured.json")
    if os.path.exists(bm):
        with open(bm) as fh:
            b = json.load(fh).get(f"{DATATYPE}{tag}_maps_per_s_{NUM_MAPS}")
        if b:
            base = value / b

    print(json.dumps({
        "metric": f"synthetic {DATATYPE}{' covis' if COVIS else ''} "
                  f"{NUM_MAPS}-map hierarchical solve (ATE {ate:.2e})",
        "value": round(value, 3),
        "unit": "maps_joined/s",
        "vs_baseline": round(base, 3),
    }))


if __name__ == "__main__":
    main()
