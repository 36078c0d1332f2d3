"""Wall-clock breakdown of the device-resident tree solve.

Usage: python tools/profile_device_tree.py [NUM_MAPS] [stereo|mono] [method]

Prints the DeviceTreeSolver._last_timing split (host compact / stack / upload
/ device levels / fetch) for a cold and a warm run, plus per-level dispatch
walls — the tool for telling compile time from device compute from host prep.
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
    from linearsfm_tpu.core.device_tree import DeviceTreeSolver

    t0 = time.time()
    maps, _, _ = gen.make_dataset(NUM, TYP, noise=0.005, seed=7)
    lms = [m.to_local_map() for m in maps]
    print(f"[{time.time()-t0:7.2f}s] dataset ready ({NUM} {TYP})", flush=True)

    solver = DeviceTreeSolver(TYP, method=METHOD)
    for label in ("cold", "warm", "warm2"):
        t1 = time.time()
        out = solver.run(lms)
        jax.block_until_ready(out.poses)
        w = time.time() - t1
        print(f"{label}: {w:7.2f}s ({(NUM-1)/w:7.1f} maps/s) "
              f"timing={solver._last_timing}", flush=True)

    # per-level dispatch walls (warm): dispatch each level's program and block
    from linearsfm_tpu.core import compact as compact_mod, plan as plan_mod
    from linearsfm_tpu.parallel import level as plevel
    cm = [compact_mod.compact(lm, solver.bucket, solver.u_bucket) for lm in lms]
    syms = [plan_mod.sym_of(lm) for lm in cm]
    plans = plan_mod.plan_tree_exact(syms, TYP, solver.bucket,
                                     solver.u_bucket).levels
    cm = [lm.pad_to(*plans[0].caps_in) for lm in cm]
    x = jax.device_put(plevel.stack_maps(cm))
    jax.block_until_ready(x.poses)
    for li, lp in enumerate(plans):
        t1 = time.time()
        x, _ = solver._level_program(lp)(x)
        jax.block_until_ready(x.poses)
        print(f"L{li+1:2d} count={lp.count:4d} in={lp.caps_in} "
              f"out={lp.caps_out} wall={time.time()-t1:7.3f}s", flush=True)


if __name__ == "__main__":
    main()
