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
# "loop" (RS/NC-style turning trajectory, default) or "grid" (AP_*-style
# aerial lawnmower sweep — the bundled AP sets are monocular aerial,
# /root/reference/DataForC/AP_Vaihingen_C/*.txt:1).
PATTERN = os.environ.get("BENCH_PATTERN", "loop")


def log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def build_solver():
    if EXECUTOR == "device":
        from linearsfm_tpu.core.device_tree import DeviceTreeSolver
        kw = {}
        if "BENCH_EXIT_TOL" in os.environ:   # perf-bisection knob
            kw["pcg_exit_tol"] = float(os.environ["BENCH_EXIT_TOL"])
        return DeviceTreeSolver(DATATYPE, method=METHOD, **kw)
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
        f"covis={'on' if COVIS else 'off'}, pattern={PATTERN})")
    maps, poses_gt, _ = gen.make_dataset(NUM_MAPS, DATATYPE, noise=0.005,
                                         seed=7, pattern=PATTERN, **cov)
    lms = [m.to_local_map() for m in maps]
    solver = build_solver()

    t0 = time.time()
    log(f"warmup run (AOT concurrent compile + first exec, exec={EXECUTOR})")
    final = solver.run(lms)
    jax.block_until_ready(final.poses)
    log(f"warmup done in {time.time() - t0:.1f}s "
        f"{getattr(solver, '_last_timing', '')}")

    from linearsfm_tpu.utils.metrics import LevelMetrics
    metrics = LevelMetrics()
    t0 = time.time()
    final = solver.run(lms, metrics=metrics) \
        if EXECUTOR == "device" else solver.run(lms)
    jax.block_until_ready(final.poses)
    wall = time.time() - t0
    log(f"timed run: {wall:.2f}s")

    # Convergence + utilization telemetry (device executor only): per-level
    # PCG residuals land in the metrics records (fetched once, after the
    # tree); a third, opt-in profiled pass records TRUE per-level execution
    # walls (the async pipeline's `wall` is enqueue time) to sanity-check the
    # host-side FLOP model (utils/flops.py) against measured level walls.
    res_max = None
    mfu_rec = None
    if EXECUTOR == "device":
        rs = [r.get("res_max") for r in metrics.records
              if r.get("res_max") is not None]
        if rs:
            res_max = max(rs)
        for r in metrics.records:
            log(f"  level {r['level']}: join_m={r.get('join_m')} "
                f"res_max={r.get('res_max', float('nan')):.3e}")
        try:
            from linearsfm_tpu.core import compact as compact_mod
            from linearsfm_tpu.core import plan as plan_mod
            from linearsfm_tpu.utils import flops as flops_mod
            st = compact_mod.compact_stack(lms, solver.bucket,
                                           solver.u_bucket)
            tp = plan_mod.plan_tree_exact(plan_mod.sym_of_stacked(st),
                                          DATATYPE, solver.bucket,
                                          solver.u_bucket)

            def iters_fn(join_m):
                return (solver.top_iters if join_m >= solver.top_min_m
                        else solver.refine_iters)

            mfu_rec = flops_mod.mfu(tp, DATATYPE, iters_fn, wall)
            log(f"model: {mfu_rec['mxu_f32_flops']:.3e} f32-MXU FLOPs, "
                f"{mfu_rec['vpu_f64_flops']:.3e} f64 FLOPs, "
                f"{mfu_rec['hbm_gb']:.1f} GB HBM -> "
                f"{mfu_rec['achieved_f32_tflops']:.2f} TF/s achieved = "
                f"{100 * mfu_rec['mfu_f32']:.1f}% of f32 peak, "
                f"{mfu_rec['hbm_gbps']:.0f} GB/s")
            if os.environ.get("BENCH_PROFILE_LEVELS", "1") != "0":
                prof = LevelMetrics()
                solver.run(lms, metrics=prof, time_levels=True)
                for r, c in zip(prof.records, mfu_rec["levels"]):
                    ew = r.get("exec_wall")
                    if ew:
                        log(f"  level {r['level']} exec {ew:.3f}s "
                            f"model {c['mxu_f32'] / 1e9:.1f} GF mxu "
                            f"-> {c['mxu_f32'] / ew / 1e12:.2f} TF/s")
        except Exception as e:  # noqa: BLE001 — telemetry never fails bench
            log(f"mfu/profiling telemetry failed: {e}")

    ids = np.asarray(final.pose_ids)
    poses = np.asarray(final.poses)
    err = [float(np.linalg.norm(poses[s][:3] - poses_gt[int(i)][:3]))
           for s, i in enumerate(ids) if i >= 0]
    ate = float(np.sqrt(np.mean(np.square(err))))

    joins = NUM_MAPS - 1
    value = joins / wall

    base = 0.0
    tag = ("_covis" if COVIS else "") + ("_grid" if PATTERN == "grid" else "")
    bm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "baseline_measured.json")
    if os.path.exists(bm):
        with open(bm) as fh:
            b = json.load(fh).get(f"{DATATYPE}{tag}_maps_per_s_{NUM_MAPS}")
        if b:
            base = value / b

    rec = {
        "metric": f"synthetic {DATATYPE}{' covis' if COVIS else ''}"
                  f"{' grid' if PATTERN == 'grid' else ''} "
                  f"{NUM_MAPS}-map hierarchical solve (ATE {ate:.2e})",
        "value": round(value, 3),
        "unit": "maps_joined/s",
        "vs_baseline": round(base, 3),
    }
    if res_max is not None:
        rec["res_max"] = float(f"{res_max:.3e}")
    if mfu_rec is not None:
        rec["mfu"] = round(mfu_rec["mfu_f32"], 4)
        rec["achieved_f32_tflops"] = round(mfu_rec["achieved_f32_tflops"], 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
