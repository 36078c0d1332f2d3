"""Per-stage / per-level compile-cost probe for the device executor.

Times: dataset gen, compact_stack, plan, per-level lower, per-level compile
(serial by default, concurrent with --concurrent), then two executions.
Run on the real TPU:  python tools/compile_probe.py --maps 2048
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def log(msg):
    print(f"[probe {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maps", type=int, default=2048)
    ap.add_argument("--type", default="stereo")
    ap.add_argument("--concurrent", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import dataclasses
    import numpy as np
    import jax
    from synth import generate as gen
    from linearsfm_tpu.core.device_tree import DeviceTreeSolver
    from linearsfm_tpu.core import compact as compact_mod
    from linearsfm_tpu.core import plan as plan_mod

    t0 = time.time()
    maps, poses_gt, _ = gen.make_dataset(args.maps, args.type, noise=0.005,
                                         seed=7)
    lms = [m.to_local_map() for m in maps]
    log(f"gen: {time.time()-t0:.1f}s")

    solver = DeviceTreeSolver(args.type)
    t0 = time.time()
    stacked = compact_mod.compact_stack(lms, solver.bucket, solver.u_bucket)
    log(f"compact_stack: {time.time()-t0:.1f}s")
    t0 = time.time()
    syms = plan_mod.sym_of_stacked(stacked)
    tp = plan_mod.plan_tree_exact(syms, solver.datatype, solver.bucket,
                                 solver.u_bucket)
    log(f"plan: {time.time()-t0:.1f}s  levels={len(tp.levels)}")
    for lp in tp.levels:
        log(f"  level count={lp.count} caps_in={lp.caps_in} caps_out={lp.caps_out}")

    Mi, Ni, KUi, KWi = tp.levels[0].caps_in

    def grow(a, cap, fill=0):
        if a.ndim < 2 or a.shape[1] >= cap:
            return a
        return np.pad(a, [(0, 0), (0, cap - a.shape[1])]
                      + [(0, 0)] * (a.ndim - 2), constant_values=fill)

    stacked = dataclasses.replace(
        stacked,
        pose_ids=grow(stacked.pose_ids, Mi, -1), poses=grow(stacked.poses, Mi),
        feat_ids=grow(stacked.feat_ids, Ni, -1), feats=grow(stacked.feats, Ni),
        U=grow(stacked.U, KUi), Uij=grow(stacked.Uij, KUi),
        W=grow(stacked.W, KWi), Wpf=grow(stacked.Wpf, KWi),
        V=grow(stacked.V, Ni))
    x_shape = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), stacked)

    if args.concurrent:
        t0 = time.time()
        n = solver.ensure_warm(tp, x_shape)
        log(f"ensure_warm concurrent: {n} programs in {time.time()-t0:.1f}s")
    else:
        lows = []
        for li, lp in enumerate(tp.levels):
            t0 = time.time()
            low = solver._level_program(lp).lower(x_shape)
            x_shape = low.out_info[0]
            lows.append((li, lp, low))
            log(f"lower L{li} (count={lp.count}): {time.time()-t0:.1f}s")
        t0 = time.time()
        flow = solver._final_program(tp.root_caps, tp.root_regauge).lower(
            x_shape)
        log(f"lower final: {time.time()-t0:.1f}s")
        for li, lp, low in lows:
            t0 = time.time()
            exe = low.compile()
            solver._aot[solver._level_key(lp)[0]] = (exe, low.out_info)
            log(f"compile L{li} (count={lp.count}): {time.time()-t0:.1f}s")
        t0 = time.time()
        exe = flow.compile()
        solver._aot[("final", tp.root_caps, tp.root_regauge)] = (
            exe, flow.out_info)
        log(f"compile final: {time.time()-t0:.1f}s")

    for i in range(2):
        t0 = time.time()
        final = solver.run(lms)
        jax.block_until_ready(final.poses)
        log(f"run {i}: {time.time()-t0:.2f}s  timing={solver._last_timing}")

    ids = np.asarray(final.pose_ids)
    poses = np.asarray(final.poses)
    err = [float(np.linalg.norm(poses[s][:3] - poses_gt[int(i)][:3]))
           for s, i in enumerate(ids) if i >= 0]
    log(f"ATE {float(np.sqrt(np.mean(np.square(err)))):.3e}")


if __name__ == "__main__":
    main()
