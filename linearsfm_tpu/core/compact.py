"""Host-side map compaction between tree levels.

Joins and transforms grow block-list capacities (zero-padded, duplicate
coordinates). Between levels — on the host, outside jit — we compact each map:
gather valid poses/features to the front, merge duplicate block coordinates,
drop zero blocks, and re-pad to bucketed capacities so one jitted join per
shape bucket serves a whole tree level.

This replaces the reference's malloc/free lifecycle (e.g.
/root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:1971-1986) with an
explicit capacity policy.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from .. import types


def compact(lm: types.LocalMap, bucket: int = 16,
            u_bucket: int = 64) -> types.LocalMap:
    """Return an equivalent LocalMap with tight, bucketed capacities."""
    host = jax.device_get(lm)  # ONE transfer for the whole map
    lm = host
    pose_ids = np.asarray(lm.pose_ids)
    poses = np.asarray(lm.poses)
    feat_ids = np.asarray(lm.feat_ids)
    feats = np.asarray(lm.feats)
    U = np.asarray(lm.U)
    Uij = np.asarray(lm.Uij)
    W = np.asarray(lm.W)
    Wpf = np.asarray(lm.Wpf)
    V = np.asarray(lm.V)

    pvalid = pose_ids >= 0
    fvalid = feat_ids >= 0
    # old slot -> new slot
    pmap = np.full(lm.M, -1, np.int64)
    pmap[pvalid] = np.arange(pvalid.sum())
    fmap = np.full(lm.N, -1, np.int64)
    fmap[fvalid] = np.arange(fvalid.sum())

    m, n = int(pvalid.sum()), int(fvalid.sum())
    Mo = types.bucket(m, bucket)
    No = types.bucket(n, bucket)

    # --- U: drop zero blocks / dead slots, canonical upper (i<=j), merge dups
    nz = np.any(U != 0, axis=(1, 2))
    i, j = pmap[Uij[:, 0]], pmap[Uij[:, 1]]
    nz &= (i >= 0) & (j >= 0)
    i, j, Ub = i[nz], j[nz], U[nz]
    lower = i > j
    i2 = np.where(lower, j, i)
    j2 = np.where(lower, i, j)
    Ub = np.where(lower[:, None, None], np.swapaxes(Ub, 1, 2), Ub)
    key = i2 * Mo + j2
    order = np.argsort(key, kind="stable")
    key_s, Ub_s = key[order], Ub[order]
    uniq, inv = np.unique(key_s, return_inverse=True)
    Um = np.zeros((len(uniq), 6, 6))
    np.add.at(Um, inv, Ub_s)
    Uij_m = np.stack([uniq // Mo, uniq % Mo], axis=1)

    # --- W: same
    nzw = np.any(W != 0, axis=(1, 2))
    p, f = pmap[Wpf[:, 0]], fmap[Wpf[:, 1]]
    nzw &= (p >= 0) & (f >= 0)
    p, f, Wb = p[nzw], f[nzw], W[nzw]
    keyw = p * No + f
    orderw = np.argsort(keyw, kind="stable")
    keyw_s, Wb_s = keyw[orderw], Wb[orderw]
    uniqw, invw = np.unique(keyw_s, return_inverse=True)
    Wm = np.zeros((len(uniqw), 6, 3))
    np.add.at(Wm, invw, Wb_s)
    Wpf_m = np.stack([uniqw // No, uniqw % No], axis=1)

    KU = types.bucket(len(Um), u_bucket)
    KW = types.bucket(len(Wm), u_bucket)

    def pad(x, k, fill=0.0):
        out = np.full((k,) + x.shape[1:], fill, x.dtype)
        out[: len(x)] = x
        return out

    dtype = np.dtype(lm.dtype)
    gauge = jax.device_get(lm.gauge)  # host scalars; one bundled get
    return types.LocalMap(
        pose_ids=pad(pose_ids[pvalid], Mo, -1).astype(np.int32),
        poses=pad(poses[pvalid], Mo).astype(dtype),
        feat_ids=pad(feat_ids[fvalid], No, -1).astype(np.int32),
        feats=pad(feats[fvalid], No).astype(dtype),
        U=pad(Um, KU).astype(dtype),
        Uij=pad(Uij_m, KU).astype(np.int32),
        W=pad(Wm, KW).astype(dtype),
        Wpf=pad(Wpf_m, KW).astype(np.int32),
        V=pad(V[fvalid], No).astype(dtype),
        n_poses=np.int32(m),
        n_feats=np.int32(n),
        n_U=np.int32(len(Um)),
        n_W=np.int32(len(Wm)),
        gauge=gauge,
    )


def stats(lm: types.LocalMap) -> dict:
    return dict(
        M=lm.M, N=lm.N, KU=lm.KU, KW=lm.KW,
        m=int(lm.n_poses), n=int(lm.n_feats),
        nU=int(np.any(np.asarray(lm.U) != 0, axis=(1, 2)).sum()),
        nW=int(np.any(np.asarray(lm.W) != 0, axis=(1, 2)).sum()),
    )
