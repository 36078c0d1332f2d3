"""ATE comparison: TPU pipeline vs the reference oracle on a shared dataset.

Usage: python tools/compare_ate.py --num 128 --type stereo [--noise 0.005]
Runs both on freshly generated data and reports max/RMS pose differences and
each one's error vs ground truth.
"""
import argparse
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--type", choices=["stereo", "mono"], default="stereo")
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--pattern", default="loop")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from synth import generate as gen
    from linearsfm_tpu.core import pipeline
    from linearsfm_tpu.io import localmap as lio

    d = tempfile.mkdtemp(prefix="ate_")
    maps, poses_gt, _ = gen.make_dataset(args.num, args.type, noise=args.noise,
                                         seed=args.seed, pattern=args.pattern)
    gen.write_dataset(maps, d)

    oracle = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "oracle", "linearsfm_oracle")
    typ = "Stereo" if args.type == "stereo" else "Monocular"
    t0 = time.time()
    subprocess.run([oracle, "-path", d, "-num", str(args.num), "-type", typ,
                    "-p", d + "/pose_ref.txt", "-f", d + "/feat_ref.txt"],
                   check=True, capture_output=True, timeout=3600)
    t_oracle = time.time() - t0

    final, t_tpu = pipeline.run(d, args.num, args.type,
                                pose_path=d + "/pose_tpu.txt",
                                feat_path=d + "/feat_tpu.txt", progress=False)

    ids_r, pr = lio.read_poses(d + "/pose_ref.txt")
    ids_t, pt = lio.read_poses(d + "/pose_tpu.txt")
    assert (ids_r == ids_t).all()
    d_ref = np.abs(pr - pt)
    def ate(p, ids):
        errs = [np.linalg.norm(p[i, :3] - poses_gt[int(ids[i]), :3])
                for i in range(len(ids))]
        return float(np.sqrt(np.mean(np.square(errs))))
    print(f"maps={args.num} type={args.type} noise={args.noise}")
    print(f"oracle wall: {t_oracle:.2f}s   tpu wall: {t_tpu:.2f}s")
    print(f"pose diff vs oracle: max {d_ref.max():.3e}  rms {np.sqrt((d_ref**2).mean()):.3e}")
    print(f"ATE vs gt: oracle {ate(pr, ids_r):.4f}  tpu {ate(pt, ids_t):.4f}")


if __name__ == "__main__":
    main()
