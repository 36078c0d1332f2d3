"""Readers/writers for the reference's local-map text format.

Format (stereo, lmj_readInformationStereo,
/root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:3044-3131):

    Ref
    r                       # state length = 6m + 3n
    (stno stVal) * r        # stno: -poseId repeated 6x | featId repeated 3x
    m n
    nU  U[36*nU]  Ui[nU]  Uj[nU]
    nW  W[18*nW]  photo[nW]  feature[nW]   # feature-grouped, slot indices
    V[9*n]
    FBlock[n]

Mono (lmj_readInformationMono :6660-6753) prefixes the header with
``Ref ScaP Fix Sign``.

Parsing is a single whitespace-token stream (numpy fromstring-style), ~100x
faster than per-token scanf for NC3500-scale ingest; an optional C parser
lives in native/ for the full-dataset hot path.
"""

from __future__ import annotations

import numpy as np

from .. import types


def _tokens(path: str) -> np.ndarray:
    with open(path, "rb") as fh:
        data = fh.read()
    return np.array(data.split(), dtype=object)


class _Stream:
    def __init__(self, path):
        with open(path, "r") as fh:
            self.toks = fh.read().split()
        self.pos = 0

    def ints(self, k):
        out = np.array(self.toks[self.pos:self.pos + k], dtype=np.int64)
        self.pos += k
        return out

    def floats(self, k):
        out = np.array(self.toks[self.pos:self.pos + k], dtype=np.float64)
        self.pos += k
        return out

    def int1(self):
        v = int(self.toks[self.pos]); self.pos += 1
        return v


def read_local_map(path: str, datatype: str, dtype=np.float64) -> types.LocalMap:
    """Parse one localmap_<i>.txt into a LocalMap.

    Uses the native C tokenizer (native/fastparse.c) when available, with the
    pure-Python stream as fallback.
    """
    from ..native import get_fastparse
    fp = get_fastparse()
    if fp is not None:
        (hdr, stno, stval, dims, U, Ui, Uj, W, photo, feature, V,
         _fblock) = fp.parse(path, datatype == "mono")
        ref, scap, fix, sign = (int(v) for v in hdr)
        m, n = (int(v) for v in dims)
        pose_ids = -stno[0:6 * m:6]
        feat_ids = stno[6 * m::3]
        poses = stval[:6 * m].reshape(m, 6)
        feats = stval[6 * m:].reshape(n, 3)
        if datatype == "mono":
            gauge = types.Gauge.mono(ref, scap, fix, sign)
        else:
            gauge = types.Gauge.stereo(ref)
        return types.make_local_map(
            pose_ids, poses, feat_ids, feats,
            U.reshape(-1, 6, 6), np.stack([Ui, Uj], 1),
            W.reshape(-1, 6, 3), np.stack([photo, feature], 1),
            V.reshape(-1, 3, 3), gauge, dtype=dtype)

    s = _Stream(path)
    if datatype == "mono":
        ref, scap, fix, sign = s.int1(), s.int1(), s.int1(), s.int1()
    else:
        ref = s.int1()
        scap, fix, sign = -1, -1, 1
    r = s.int1()
    pairs = s.floats(2 * r).reshape(r, 2)
    stno = pairs[:, 0].astype(np.int64)
    stval = pairs[:, 1]
    m, n = s.int1(), s.int1()
    nU = s.int1()
    U = s.floats(36 * nU).reshape(nU, 6, 6)
    Ui = s.ints(nU)
    Uj = s.ints(nU)
    nW = s.int1()
    W = s.floats(18 * nW).reshape(nW, 6, 3)
    photo = s.ints(nW)
    feature = s.ints(nW)
    V = s.floats(9 * n).reshape(n, 3, 3)
    _fblock = s.ints(n)

    pose_ids = -stno[0:6 * m:6]
    feat_ids = stno[6 * m::3]
    poses = stval[:6 * m].reshape(m, 6)
    feats = stval[6 * m:].reshape(n, 3)

    if datatype == "mono":
        gauge = types.Gauge.mono(ref, scap, fix, sign)
    else:
        gauge = types.Gauge.stereo(ref)
    return types.make_local_map(pose_ids, poses, feat_ids, feats,
                                U, np.stack([Ui, Uj], 1), W,
                                np.stack([photo, feature], 1), V, gauge,
                                dtype=dtype)


def write_local_map(path: str, lm_np: dict, datatype: str) -> None:
    """Write the reference text format from a dict of numpy arrays:
    pose_ids[m], poses[m,6], feat_ids[n], feats[n,3], U[nU,6,6], Uij[nU,2],
    W[nW,6,3] (feature-grouped), Wpf[nW,2], V[n,3,3], gauge dict.
    """
    g = lm_np["gauge"]
    m = len(lm_np["pose_ids"])
    n = len(lm_np["feat_ids"])
    U, Uij = lm_np["U"], lm_np["Uij"]
    W, Wpf = lm_np["W"], lm_np["Wpf"]
    V = lm_np["V"]
    # W must be grouped by feature with FBlock pointing at first entry
    order = np.argsort(Wpf[:, 1], kind="stable")
    W, Wpf = W[order], Wpf[order]
    fblock = np.full(n, -1, np.int64)
    for k in range(len(Wpf) - 1, -1, -1):
        fblock[Wpf[k, 1]] = k

    out = []
    if datatype == "mono":
        out += [f"{g['ref']}", f"{g['scap']}", f"{g['fix']}", f"{g['sign']}"]
    else:
        out += [f"{g['ref']}"]
    out.append(f"{6 * m + 3 * n}")
    lines = []
    for i in range(m):
        for c in range(6):
            lines.append(f"{-lm_np['pose_ids'][i]} {lm_np['poses'][i, c]:.17g}")
    for f in range(n):
        for c in range(3):
            lines.append(f"{lm_np['feat_ids'][f]} {lm_np['feats'][f, c]:.17g}")
    out += lines
    out += [f"{m}", f"{n}"]
    out.append(f"{len(U)}")
    out += [f"{v:.17g}" for v in U.reshape(-1)]
    out += [f"{v}" for v in Uij[:, 0]]
    out += [f"{v}" for v in Uij[:, 1]]
    out.append(f"{len(W)}")
    out += [f"{v:.17g}" for v in W.reshape(-1)]
    out += [f"{v}" for v in Wpf[:, 0]]
    out += [f"{v}" for v in Wpf[:, 1]]
    out += [f"{v:.17g}" for v in V.reshape(-1)]
    out += [f"{v}" for v in fblock]
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")


def write_poses(path: str, pose_ids, poses) -> None:
    """Pose file: `id tx ty tz a b g`, sorted by id (lmj_SavePoses_3DPF :7938-7948)."""
    order = np.argsort(pose_ids)
    with open(path, "w") as fh:
        for i in order:
            p = poses[i]
            fh.write(f"{pose_ids[i]}  {p[0]:f}  {p[1]:f}  {p[2]:f} {p[3]:f}  {p[4]:f}  {p[5]:f}\n")


def write_features(path: str, feat_ids, feats) -> None:
    order = np.argsort(feat_ids)
    with open(path, "w") as fh:
        for i in order:
            f = feats[i]
            fh.write(f"{feat_ids[i]}  {f[0]:f}  {f[1]:f} {f[2]:f}\n")


def write_state(path: str, pose_ids, poses, feat_ids, feats) -> None:
    """State vector as `(stno, value)` lines (lmj_SaveStateVector :2102-2117)."""
    with open(path, "w") as fh:
        for i in range(len(pose_ids)):
            for c in range(6):
                fh.write(f"{-pose_ids[i]} {poses[i, c]:f}\n")
        for f in range(len(feat_ids)):
            for c in range(3):
                fh.write(f"{feat_ids[f]} {feats[f, c]:f}\n")


def read_poses(path: str):
    a = np.loadtxt(path).reshape(-1, 7)
    return a[:, 0].astype(np.int64), a[:, 1:7]


def read_features(path: str):
    a = np.loadtxt(path).reshape(-1, 4)
    return a[:, 0].astype(np.int64), a[:, 1:4]
