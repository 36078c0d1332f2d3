"""Separate transfer cost from exec cost for one tree level.

Times (a) host->device upload of the stacked level inputs, (b) jitted level
execution with device-resident inputs, (c) device->host fetch — the numbers
that decide whether the tree executor must keep maps device-resident.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

NUM = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def t(fn, *a):
    import jax
    t0 = time.time()
    r = fn(*a)
    jax.tree.map(lambda x: x.block_until_ready()
                 if hasattr(x, "block_until_ready") else x, r)
    return time.time() - t0, r


def main():
    import jax
    from synth import generate as gen
    from linearsfm_tpu.core.tree import TreeSolver
    from linearsfm_tpu.core import compact as compact_mod
    from linearsfm_tpu.core import join as join_mod
    from linearsfm_tpu.parallel import level as plevel

    maps, _, _ = gen.make_dataset(NUM, "stereo", noise=0.005, seed=7)
    lms = [compact_mod.compact(m.to_local_map(), 16, 64) for m in maps]
    npair = NUM // 2
    gs = [lms[2 * i] for i in range(npair)]
    ms = [lms[2 * i + 1] for i in range(npair)]
    G = plevel.stack_maps(gs)
    Mb = plevel.stack_maps(ms)
    nbytes = sum(x.nbytes for x in jax.tree.leaves((G, Mb)))
    print(f"level input: {nbytes/1e6:.1f} MB, npair={npair}", flush=True)

    dt, (Gd, Md) = t(jax.device_put, (G, Mb))
    print(f"upload   cold: {dt:.3f}s", flush=True)
    dt, (Gd, Md) = t(jax.device_put, (G, Mb))
    print(f"upload   warm: {dt:.3f}s  ({nbytes/1e6/dt:.1f} MB/s)", flush=True)

    solver = TreeSolver("stereo")
    sig = jax.tree.map(lambda x: x.shape, (Gd, Md))
    fn = solver._level_fn(sig, 4)
    dt, out = t(fn, Gd, Md)
    print(f"exec     cold: {dt:.3f}s", flush=True)
    for i in range(3):
        dt, out = t(fn, Gd, Md)
        print(f"exec     warm: {dt:.3f}s", flush=True)
    dt, _ = t(jax.device_get, out)
    nout = sum(x.nbytes for x in jax.tree.leaves(out))
    print(f"download warm: {dt:.3f}s ({nout/1e6:.1f} MB)", flush=True)

    # dispatch latency floor: trivial jitted op on resident data
    f0 = jax.jit(lambda x: x.poses.sum())
    t(f0, Gd)
    for i in range(3):
        dt, _ = t(f0, Gd)
        print(f"null dispatch: {dt*1000:.1f}ms", flush=True)


if __name__ == "__main__":
    main()
