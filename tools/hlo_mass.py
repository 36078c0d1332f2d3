"""Executable-mass probe: count the HLO ops that dominate axon executable
size (CLAUDE.md compile-cost model: ~1.1 MB per f64 transcendental, ~27 KB
per f64 elementwise op, scatter ~60 MB per million scattered elements).

Lowers every level program of an N-map tree on CPU (no TPU needed) and
reports per-program op counts + a size estimate, so compile-mass work can be
targeted without burning tunnel compiles.

Usage: python tools/hlo_mass.py [N] [stereo|mono]
"""
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
os.environ.setdefault("LINEARSFM_JAX_CACHE", "0")

import jax

jax.config.update("jax_platforms", "cpu")

TRANS = re.compile(r"stablehlo\.(sine|cosine|atan2|tangent|exponential|log|"
                   r"rsqrt|sqrt|power)\b")
F64 = re.compile(r"tensor<[^>]*xf64>")


def analyze(text: str):
    trans_f64 = 0
    trans = collections.Counter()
    f64_ops = 0
    total_ops = 0
    for line in text.splitlines():
        m = TRANS.search(line)
        is64 = bool(F64.search(line))
        if "stablehlo." in line:
            total_ops += 1
            if is64:
                f64_ops += 1
        if m and is64:
            trans_f64 += 1
            trans[m.group(1)] += 1
    est_mb = trans_f64 * 1.1 + (f64_ops - trans_f64) * 0.027
    return dict(trans_f64=trans_f64, f64_ops=f64_ops, total=total_ops,
                est_mb=round(est_mb, 1), kinds=dict(trans))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    typ = sys.argv[2] if len(sys.argv) > 2 else "stereo"
    from synth import generate as gen
    from linearsfm_tpu.core import compact as C, plan as plan_mod
    from linearsfm_tpu.core.device_tree import DeviceTreeSolver

    maps, _, _ = gen.make_dataset(n, typ, noise=0.005, seed=7,
                                  covis_radius=6.0, covis_max=6)
    lms = [m.to_local_map() for m in maps]
    s = DeviceTreeSolver(typ)
    stacked = C.compact_stack(lms, s.bucket, s.u_bucket)
    tp = plan_mod.plan_tree_exact(plan_mod.sym_of_stacked(stacked), typ,
                                  s.bucket, s.u_bucket)
    x_shape = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), stacked)
    tot = 0.0
    for li, lp in enumerate(tp.levels):
        low = s._level_program(lp).lower(x_shape)
        r = analyze(low.as_text())
        x_shape = low.out_info[0]
        tot += r["est_mb"]
        print(f"L{li+1:2d} count={lp.count:5d} caps_out={lp.caps_out} "
              f"trans64={r['trans_f64']:4d} f64ops={r['f64_ops']:6d} "
              f"est={r['est_mb']:7.1f}MB {r['kinds']}", flush=True)
    low = s._final_program(tp.root_caps, tp.root_regauge).lower(x_shape)
    r = analyze(low.as_text())
    tot += r["est_mb"]
    print(f"final              trans64={r['trans_f64']:4d} "
          f"f64ops={r['f64_ops']:6d} est={r['est_mb']:7.1f}MB")
    print(f"TOTAL est ~{tot:.0f} MB")


if __name__ == "__main__":
    main()
