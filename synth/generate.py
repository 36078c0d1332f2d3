"""Synthetic local-map dataset generator.

The reference repo ships no data (Google-Drive pointers only,
/root/reference/DataForC/*/), so correctness and benchmarking run on synthetic
sequences generated here: a smooth ground-truth trajectory + landmarks,
decomposed into overlapping local maps with realistic block-sparse information
matrices (Gauss-Newton Hessians of point observations + pose priors), in both
the in-memory LocalMap form and the reference's text format (so the compiled
reference binary can consume identical inputs as the golden oracle).

Conventions match the reference: a pose is (t, alpha, beta, gamma) with
R = Rx(g)Ry(b)Rz(a) mapping gauge-frame coords to camera coords via
p_cam = R (p - t). World frame == frame of pose 0 (the final output gauge).

* Stereo map k: ref = k (implicit), explicit pose k+1, features owned by
  poses k..k+1 (2F of them), observed from cameras k and k+1.
* Mono map k: ref = k (explicit, zero state/info), scap = k+1, fix chosen as
  the dominant axis of t_{k+1} in k's frame, everything scale-normalized.
  Explicit poses {k, k+1, k+2}; consecutive maps share exactly {ref, scap}.
"""

from __future__ import annotations

import os

import numpy as np


# --- rotation helpers (numpy mirrors of ops/rotations.py) -------------------

def euler_to_r(abg):
    a, b, g = abg
    ca, sa, cb, sb, cg, sg = np.cos(a), np.sin(a), np.cos(b), np.sin(b), np.cos(g), np.sin(g)
    return np.array([
        [cb * ca, cb * sa, -sb],
        [sg * sb * ca - cg * sa, sg * sb * sa + cg * ca, sg * cb],
        [cg * sb * ca + sg * sa, cg * sb * sa - sg * ca, cg * cb]])


def r_to_euler(R):
    beta = np.arctan2(-R[0, 2], np.hypot(R[0, 0], R[0, 1]))
    cb = np.cos(beta)
    return np.array([np.arctan2(R[0, 1] / cb, R[0, 0] / cb), beta,
                     np.arctan2(R[1, 2] / cb, R[2, 2] / cb)])


def _dR(abg):
    """(dR/da, dR/db, dR/dg) by analytic products."""
    a, b, g = abg
    ca, sa, cb, sb, cg, sg = np.cos(a), np.sin(a), np.cos(b), np.sin(b), np.cos(g), np.sin(g)
    Rz = np.array([[ca, sa, 0], [-sa, ca, 0], [0, 0, 1]])
    Ry = np.array([[cb, 0, -sb], [0, 1, 0], [sb, 0, cb]])
    Rx = np.array([[1, 0, 0], [0, cg, sg], [0, -sg, cg]])
    dRz = np.array([[-sa, ca, 0], [-ca, -sa, 0], [0, 0, 0]])
    dRy = np.array([[-sb, 0, -cb], [0, 0, 0], [cb, 0, -sb]])
    dRx = np.array([[0, 0, 0], [0, -sg, cg], [0, -cg, -sg]])
    return Rx @ Ry @ dRz, Rx @ dRy @ Rz, dRx @ Ry @ Rz


# --- trajectory + landmarks -------------------------------------------------

def make_world(num_poses: int, feats_per_pose: int = 4, seed: int = 0,
               turn_rate: float = 0.15, step: float = 1.0,
               pattern: str = "loop"):
    """Ground truth: poses[P,6] (world frame = frame of pose 0), landmark
    positions owned per pose. Returns (poses_gt[P,6], feats_gt[P*F,3],
    feat_owner[P*F]).

    pattern="loop": turning ground trajectory (RS/NC-style sequences).
    pattern="grid": nadir-looking lawnmower sweep (AP_* aerial photogrammetry
    style: long straight strips with 180-degree turns between them)."""
    rng = np.random.default_rng(seed)
    P, F = num_poses, feats_per_pose
    poses = np.zeros((P, 6))
    t = np.zeros(3)
    R = np.eye(3)
    strip = max(8, int(np.sqrt(P) * 1.5))
    for i in range(P):
        if i > 0:
            if pattern == "grid":
                turning = (i % strip) == 0
                rate = np.pi / 2 if turning else 0.0
            else:
                rate = turn_rate
            fwd = R.T @ np.array([step, 0.0, 0.0])
            t = t + fwd + rng.normal(0, 0.05, 3)
            dab = np.array([rate + rng.normal(0, 0.02),
                            rng.normal(0, 0.02), rng.normal(0, 0.02)])
            R = euler_to_r(dab) @ R
        poses[i, 0:3] = t
        poses[i, 3:6] = r_to_euler(R)
    feats = np.zeros((P * F, 3))
    for i in range(P):
        base = poses[i, 0:3]
        feats[i * F:(i + 1) * F] = base + rng.normal(0, 2.0, (F, 3)) + np.array([0, 0, 3.0])
    owner = np.repeat(np.arange(P), F)
    return poses, feats, owner


# --- information assembly ---------------------------------------------------

def _point_obs_info(pose, feat, w=25.0):
    """GN info of h = R(f - t) observed from an explicit pose.

    Returns (Hpp[6,6], Hpf[6,3], Hff[3,3]) = J^T w J blocks."""
    t, abg = pose[0:3], pose[3:6]
    R = euler_to_r(abg)
    dRa, dRb, dRg = _dR(abg)
    d = feat - t
    Jp = np.zeros((3, 6))
    Jp[:, 0:3] = -R
    Jp[:, 3] = dRa @ d
    Jp[:, 4] = dRb @ d
    Jp[:, 5] = dRg @ d
    Jf = R
    return w * Jp.T @ Jp, w * Jp.T @ Jf, w * Jf.T @ Jf


class SynthMap:
    """Plain-numpy local map (converted to LocalMap / text format on demand)."""

    def __init__(self, pose_ids, poses, feat_ids, feats, U, Uij, W, Wpf, V, gauge):
        self.pose_ids, self.poses = pose_ids, poses
        self.feat_ids, self.feats = feat_ids, feats
        self.U, self.Uij, self.W, self.Wpf, self.V = U, Uij, W, Wpf, V
        self.gauge = gauge

    def to_local_map(self, dtype=np.float64):
        from linearsfm_tpu import types
        if self.gauge["type"] == "mono":
            g = types.Gauge.mono(self.gauge["ref"], self.gauge["scap"],
                                 self.gauge["fix"], self.gauge["sign"])
        else:
            g = types.Gauge.stereo(self.gauge["ref"])
        return types.make_local_map(self.pose_ids, self.poses, self.feat_ids,
                                    self.feats, self.U, self.Uij, self.W,
                                    self.Wpf, self.V, g)

    def write(self, path):
        from linearsfm_tpu.io import localmap as lio
        lio.write_local_map(path, dict(
            pose_ids=self.pose_ids, poses=self.poses, feat_ids=self.feat_ids,
            feats=self.feats, U=self.U, Uij=self.Uij, W=self.W, Wpf=self.Wpf,
            V=self.V, gauge=self.gauge),
            "mono" if self.gauge["type"] == "mono" else "stereo")


def _local_frame(poses_gt, ref):
    t0, R0 = poses_gt[ref, 0:3], euler_to_r(poses_gt[ref, 3:6])

    def pose_local(i):
        t = R0 @ (poses_gt[i, 0:3] - t0)
        R = euler_to_r(poses_gt[i, 3:6]) @ R0.T
        return np.concatenate([t, r_to_euler(R)])

    def feat_local(f):
        return R0 @ (f - t0)

    return pose_local, feat_local


def _covis_extra(lo, hi, poses_gt, feats_gt, owner, radius, cap, rng):
    """Loop-closure / cross-strip co-visibility: indices of features owned by
    poses OUTSIDE [lo, hi] but within `radius` of the local maps's cameras.

    The reference datasets all have this structure (RS* loops and the AP_*
    lawnmower strips revisit old landmarks, /root/reference/README.txt:63-65,
    Documentation Fig. 1-2); without it every feature is seen by <=2 maps and
    the root Schur system stays near-block-diagonal."""
    if radius <= 0 or cap <= 0:
        return np.zeros(0, np.int64)
    mid = poses_gt[lo:hi + 1, 0:3].mean(axis=0)
    d = np.linalg.norm(feats_gt - mid, axis=1)
    cand = np.where((d <= radius) & ((owner < lo) | (owner > hi)))[0]
    if len(cand) > cap:
        cand = rng.choice(cand, size=cap, replace=False)
        cand.sort()
    return cand


def make_stereo_map(k, poses_gt, feats_gt, owner, feats_per_pose,
                    noise=0.0, rng=None, prior_w=100.0,
                    covis_radius=0.0, covis_max=0):
    """Local map k: ref=k implicit, explicit pose k+1, features of poses k,k+1
    plus any co-visible (loop-closure) features within covis_radius."""
    rng = rng or np.random.default_rng(k)
    pose_local, feat_local = _local_frame(poses_gt, k)
    fsel = np.where((owner == k) | (owner == k + 1))[0]
    extra = _covis_extra(k, k + 1, poses_gt, feats_gt, owner,
                         covis_radius, covis_max, rng)
    fsel = np.concatenate([fsel, extra])
    feat_ids = 1000 + fsel
    feats = np.stack([feat_local(feats_gt[f]) for f in fsel])
    pose_ids = np.array([k + 1])
    poses = np.stack([pose_local(k + 1)])
    if noise:
        poses = poses + rng.normal(0, noise, poses.shape)
        feats = feats + rng.normal(0, noise, feats.shape)

    # info: pose prior (from ref-relative odometry) + point observations
    U = [prior_w * np.eye(6)]
    Uij = [(0, 0)]
    W, Wpf, V = [], [], []
    for fi in range(len(fsel)):
        # observed from implicit ref camera (identity pose in local frame):
        Hff = 25.0 * np.eye(3)
        # and from explicit camera k+1:
        Hpp, Hpf, Hff2 = _point_obs_info(poses[0], feats[fi])
        U[0] = U[0] + Hpp
        W.append(Hpf)
        Wpf.append((0, fi))
        V.append(Hff + Hff2)
    return SynthMap(pose_ids, poses, feat_ids, feats,
                    np.array(U), np.array(Uij), np.array(W), np.array(Wpf),
                    np.array(V), dict(type="stereo", ref=k))


def make_mono_map(k, poses_gt, feats_gt, owner, feats_per_pose,
                  noise=0.0, rng=None, prior_w=100.0, pin_row="zero",
                  covis_radius=0.0, covis_max=0):
    """Mono map k: explicit poses {k,k+1,k+2}, ref=k (zero info), scap=k+1,
    scale-normalized so |t_{k+1}[fix]| = 1.

    pin_row="zero" (default) stores the reduced local-BA Hessian: the pinned
    coordinate's information row/column is zeroed (the pin removed it from the
    local optimization), matching what the reference's gauge handling assumes
    (it deletes that row without a conditioning correction,
    LinearSFMImp.cpp:6994-7021). pin_row="keep" leaves the raw Hessian."""
    rng = rng or np.random.default_rng(k)
    pose_local, feat_local = _local_frame(poses_gt, k)
    p1, p2 = pose_local(k + 1), pose_local(k + 2)
    fix = int(np.argmax(np.abs(p1[0:3])))
    sign = 1 if p1[fix] >= 0 else -1
    scale = abs(p1[fix])

    fsel = np.where((owner >= k) & (owner <= k + 2))[0]
    fsel = np.concatenate([fsel, _covis_extra(k, k + 2, poses_gt, feats_gt,
                                              owner, covis_radius, covis_max,
                                              rng)])
    feat_ids = 1000 + fsel
    feats = np.stack([feat_local(feats_gt[f]) for f in fsel]) / scale
    p1 = p1.copy(); p2 = p2.copy()
    p1[0:3] /= scale
    p2[0:3] /= scale
    if noise:
        p2 = p2 + rng.normal(0, noise, 6)
        na = rng.normal(0, noise, 6); na[fix] = 0.0
        p1 = p1 + na
        feats = feats + rng.normal(0, noise, feats.shape)
    p1[fix] = float(sign)

    pose_ids = np.array([k, k + 1, k + 2])
    poses = np.stack([np.zeros(6), p1, p2])

    # info: priors on explicit non-ref poses + point observations from
    # cameras k (V-only), k+1, k+2. Nothing touches the ref slot (slot 0).
    U = [prior_w * np.eye(6), prior_w * np.eye(6)]
    Uij = [(1, 1), (2, 2)]
    W, Wpf = [], []
    V = [6.25 * np.eye(3) for _ in range(len(fsel))]
    for fi in range(len(fsel)):
        for slot in (1, 2):
            Hpp, Hpf, Hff = _point_obs_info(poses[slot], feats[fi])
            U[slot - 1] = U[slot - 1] + Hpp
            W.append(Hpf)
            Wpf.append((slot, fi))
            V[fi] = V[fi] + Hff
    if pin_row == "zero":
        # scap is pose slot 1 -> U[0]; zero the pinned coordinate's row/col
        U[0][fix, :] = 0.0
        U[0][:, fix] = 0.0
        for w_i, (slot, fi) in zip(W, Wpf):
            if slot == 1:
                w_i[fix, :] = 0.0
    return SynthMap(pose_ids, poses, feat_ids, feats,
                    np.array(U), np.array(Uij), np.array(W), np.array(Wpf),
                    np.array(V), dict(type="mono", ref=k, scap=k + 1,
                                      fix=fix, sign=sign))


def make_dataset(num_maps: int, datatype: str = "stereo", feats_per_pose: int = 4,
                 noise: float = 0.0, seed: int = 0, pattern: str = "loop",
                 covis_radius: float = 0.0, covis_max: int = 0):
    """Returns (maps: list[SynthMap], poses_gt, feats_gt).

    The ground truth is expressed in the final output gauge: frame of pose 0;
    for mono additionally scale-normalized to the first map's gauge.
    covis_radius/covis_max > 0 add loop-closure co-visibility (features of
    distant poses re-observed when the trajectory passes within the radius)."""
    span = 2 if datatype == "stereo" else 3
    P = num_maps + span - 1
    poses_gt, feats_gt, owner = make_world(P, feats_per_pose, seed=seed,
                                           pattern=pattern)
    rng = np.random.default_rng(seed + 12345)
    mk = make_stereo_map if datatype == "stereo" else make_mono_map
    maps = [mk(k, poses_gt, feats_gt, owner, feats_per_pose, noise=noise,
               rng=rng, covis_radius=covis_radius, covis_max=covis_max)
            for k in range(num_maps)]
    if datatype == "mono":
        # normalize truth to the first map's scale gauge
        fix = maps[0].gauge["fix"]
        scale = abs(poses_gt[1, fix])
        poses_gt = poses_gt.copy()
        poses_gt[:, 0:3] /= scale
        feats_gt = feats_gt / scale
    return maps, poses_gt, feats_gt


def write_dataset(maps, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    for i, m in enumerate(maps):
        m.write(os.path.join(out_dir, f"localmap_{i + 1}.txt"))


def main():
    import argparse
    ap = argparse.ArgumentParser(description="Generate synthetic local-map datasets")
    ap.add_argument("--num", type=int, default=64)
    ap.add_argument("--type", choices=["stereo", "mono"], default="stereo")
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--feats", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--pattern", choices=["loop", "grid"], default="loop")
    ap.add_argument("--covis-radius", type=float, default=0.0,
                    help="loop-closure co-visibility radius (world units)")
    ap.add_argument("--covis-max", type=int, default=0,
                    help="max extra co-visible features per map")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    maps, poses_gt, feats_gt = make_dataset(args.num, args.type, args.feats,
                                            args.noise, args.seed,
                                            pattern=args.pattern,
                                            covis_radius=args.covis_radius,
                                            covis_max=args.covis_max)
    write_dataset(maps, args.out)
    np.savetxt(os.path.join(args.out, "gt_poses.txt"),
               np.concatenate([np.arange(len(poses_gt))[:, None], poses_gt], axis=1))
    print(f"wrote {len(maps)} {args.type} maps to {args.out}")


if __name__ == "__main__":
    main()
