"""Breakdown of the root join cost at real 512-map shapes.

Times, as separate jitted programs on the device: the gauge transform, the
dense Schur assembly, the masked solve, feature back-substitution, and the
device compaction — at the capacities of the last tree level. This is the
f64 upper-level budget that the mixed-precision policy does not cover.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 512


def bench(name, fn, *args, n=3):
    import jax
    import jax.numpy as jnp
    g = jax.jit(lambda *a: jax.tree.map(
        lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))), fn(*a)))
    r = g(*args)
    jax.device_get(jax.tree.leaves(r)[0])
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = g(*args)
        jax.device_get(jax.tree.leaves(r)[0])
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1000:9.1f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from synth import generate as gen
    from linearsfm_tpu.core.device_tree import DeviceTreeSolver
    from linearsfm_tpu.core import compact as C, plan as plan_mod, dcompact
    from linearsfm_tpu.core import join as join_mod
    from linearsfm_tpu.ops import congruence, schur, solve as solve_mod
    from linearsfm_tpu.parallel import level as plevel

    maps, _, _ = gen.make_dataset(NUM, "stereo", noise=0.005, seed=7)
    lms = [m.to_local_map() for m in maps]
    s = DeviceTreeSolver("stereo", method="refine")
    cm = [C.compact(lm, s.bucket, s.u_bucket) for lm in lms]
    plans = plan_mod.plan_tree([plan_mod.counts_of(lm) for lm in cm],
                               "stereo", s.bucket, s.u_bucket)
    cm = [lm.pad_to(*plans[0].caps_in) for lm in cm]
    x = jax.device_put(plevel.stack_maps(cm))
    for lp in plans[:-1]:
        x, _ = s._level_program(lp)(x)
    lp = plans[-1]
    G = jax.tree.map(lambda a: a[0], x)
    Mb = jax.tree.map(lambda a: a[1], x)
    print(f"root caps: in={lp.caps_in} out={lp.caps_out}", flush=True)

    bench("transform (root, f64)",
          lambda g: congruence.transform_map_stereo(g, Mb.gauge.ref), G)
    end = jax.jit(lambda g: congruence.transform_map_stereo(g, Mb.gauge.ref))(G)

    cfg = join_mod.JoinConfig(max_obs=1, method="refine", dense_schur=True,
                              info_dtype="float64")
    bench("join incl solve (root)",
          lambda e, m: join_mod.join_stereo(e, m, cfg), end, Mb)
    joined = jax.jit(lambda e, m: join_mod.join_stereo(e, m, cfg))(end, Mb)
    Mo = joined.M

    def assemble(j):
        Vinv = schur.inv3x3_sym(j.V)
        eP, eF = schur.info_vector(j.poses, j.feats, j.U, j.Uij, j.W, j.Wpf, j.V)
        return schur._assemble_schur_dense(j.U, j.Uij, j.W, j.Wpf, Vinv, eP, eF, Mo)

    bench("assemble dense S (root, f64)", assemble, joined)
    S, E = jax.jit(assemble)(joined)
    bench("solve refine (root)",
          lambda S, E: solve_mod.cholesky_solve_refine(S, E, 3), S, E)
    bench("solve f32 (root)",
          lambda S, E: solve_mod.cholesky_solve(
              S.astype(jnp.float32), E.astype(jnp.float32)), S, E)
    bench("dcompact (root)",
          lambda j: dcompact.compact_device(j, *lp.caps_out)[0], joined)
    bench("matmul f64 Yd@Wd.T only",
          lambda A, B: A @ B.T,
          jnp.zeros((6 * Mo, 3 * joined.N)), jnp.zeros((6 * Mo, 3 * joined.N)))
    bench("matmul f32 Yd@Wd.T only",
          lambda A, B: A @ B.T,
          jnp.zeros((6 * Mo, 3 * joined.N), jnp.float32),
          jnp.zeros((6 * Mo, 3 * joined.N), jnp.float32))


if __name__ == "__main__":
    main()
