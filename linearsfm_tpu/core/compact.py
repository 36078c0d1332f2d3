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


def compact_stack(lms: list[types.LocalMap], bucket: int = 16,
                  u_bucket: int = 64) -> types.LocalMap:
    """Compact AND stack a whole list of maps in one vectorized pass.

    Returns a [B, ...caps] stacked LocalMap (host numpy) equivalent to
    ``stack_maps([compact(lm) for lm in lms])`` but ~10x faster for the
    512-map ingest: per-map Python/numpy call overhead dominates the
    one-map-at-a-time path (measured 0.4s of a 1.7s end-to-end solve), so
    the dedup/sort here runs ONCE on globally-offset keys for the batch.
    """
    B = len(lms)
    lms = [jax.device_get(lm) for lm in lms]
    M = max(lm.M for lm in lms)
    N = max(lm.N for lm in lms)
    KU = max(lm.KU for lm in lms)
    KW = max(lm.KW for lm in lms)

    def fill(get, shape, fill_value, dt):
        out = np.full((B,) + shape, fill_value, dt)
        for b, lm in enumerate(lms):
            a = np.asarray(get(lm))
            out[b, : a.shape[0]] = a
        return out

    dtype = np.dtype(lms[0].dtype)
    pose_ids = fill(lambda x: x.pose_ids, (M,), -1, np.int32)
    poses = fill(lambda x: x.poses, (M, 6), 0, dtype)
    feat_ids = fill(lambda x: x.feat_ids, (N,), -1, np.int32)
    feats = fill(lambda x: x.feats, (N, 3), 0, dtype)
    U = fill(lambda x: x.U, (KU, 6, 6), 0, dtype)
    Uij = fill(lambda x: x.Uij, (KU, 2), 0, np.int32)
    W = fill(lambda x: x.W, (KW, 6, 3), 0, dtype)
    Wpf = fill(lambda x: x.Wpf, (KW, 2), 0, np.int32)
    V = fill(lambda x: x.V, (N, 3, 3), 0, dtype)
    n_U = np.array([int(lm.n_U) for lm in lms])
    n_W = np.array([int(lm.n_W) for lm in lms])

    # ---- poses/features: gather valid slots to the front (stable) ---------
    pvalid = pose_ids >= 0
    fvalid = feat_ids >= 0
    m = pvalid.sum(1)
    n = fvalid.sum(1)
    Mo = types.bucket(int(m.max()), bucket)
    No = types.bucket(int(n.max()), bucket)
    porder = np.argsort(~pvalid, axis=1, kind="stable")
    forder = np.argsort(~fvalid, axis=1, kind="stable")
    pmap = np.full((B, M), -1, np.int64)
    np.put_along_axis(pmap, porder, np.arange(M)[None, :].repeat(B, 0), 1)
    pmap[~pvalid] = -1
    fmap = np.full((B, N), -1, np.int64)
    np.put_along_axis(fmap, forder, np.arange(N)[None, :].repeat(B, 0), 1)
    fmap[~fvalid] = -1

    def fit(a, k, fill=0):
        """Pad or truncate axis 1 to k (truncation only drops dead slots)."""
        if a.shape[1] >= k:
            return a[:, :k]
        return np.pad(a, [(0, 0), (0, k - a.shape[1])]
                      + [(0, 0)] * (a.ndim - 2), constant_values=fill)

    rows = np.arange(B)[:, None]
    pose_ids_c = fit(np.where(np.arange(M)[None] < m[:, None],
                              np.take_along_axis(pose_ids, porder, 1), -1),
                     Mo, -1)
    poses_c = fit(np.take_along_axis(poses, porder[..., None], 1), Mo)
    feat_ids_c = fit(np.where(np.arange(N)[None] < n[:, None],
                              np.take_along_axis(feat_ids, forder, 1), -1),
                     No, -1)
    feats_c = fit(np.take_along_axis(feats, forder[..., None], 1), No)
    V_c = fit(np.take_along_axis(V, forder[..., None, None], 1), No)

    def dedup(blocks, keys, valid, cap_out, shape):
        """Global merge of duplicate (row, key) pairs; returns per-row padded
        block/key arrays + per-row counts."""
        span = int(keys.max(initial=0)) + 1
        gkey = np.where(valid, rows * span + keys, -1).ravel()
        blk = blocks.reshape((-1,) + shape)
        sel = gkey >= 0
        gkey, blk = gkey[sel], blk[sel]
        uniq, inv = np.unique(gkey, return_inverse=True)
        acc = np.zeros((len(uniq),) + shape, blocks.dtype)
        np.add.at(acc, inv, blk)
        urow = uniq // span
        ukey = uniq % span
        cnt = np.bincount(urow, minlength=B)
        K = types.bucket(int(cnt.max(initial=0)), u_bucket) if cap_out is None else cap_out
        slot = np.arange(len(uniq)) - np.concatenate([[0], np.cumsum(cnt)])[urow]
        out = np.zeros((B, K) + shape, blocks.dtype)
        okey = np.zeros((B, K), np.int64)
        out[urow, slot] = acc
        okey[urow, slot] = ukey
        return out, okey, cnt, K

    # ---- U: remap, canonical upper, drop zero/dead, merge dups ------------
    nzU = (np.any(U != 0, axis=(2, 3))
           & (np.arange(KU)[None] < n_U[:, None]))
    ui = np.take_along_axis(pmap, Uij[:, :, 0], 1)
    uj = np.take_along_axis(pmap, Uij[:, :, 1], 1)
    nzU &= (ui >= 0) & (uj >= 0)
    lower = ui > uj
    i2 = np.where(lower, uj, ui)
    j2 = np.where(lower, ui, uj)
    Ub = np.where(lower[..., None, None], np.swapaxes(U, 2, 3), U)
    Uc, ukey, nU_c, KUo = dedup(Ub, i2 * Mo + j2, nzU, None, (6, 6))
    Uij_c = np.stack([ukey // Mo, ukey % Mo], axis=2).astype(np.int32)

    # ---- W: remap, drop zero/dead, merge dups ------------------------------
    nzW = (np.any(W != 0, axis=(2, 3))
           & (np.arange(KW)[None] < n_W[:, None]))
    wp = np.take_along_axis(pmap, Wpf[:, :, 0], 1)
    wf = np.take_along_axis(fmap, Wpf[:, :, 1], 1)
    nzW &= (wp >= 0) & (wf >= 0)
    wp = np.where(nzW, wp, 0)
    wf = np.where(nzW, wf, 0)
    Wc, wkey, nW_c, KWo = dedup(W, wp * No + wf, nzW, None, (6, 3))
    Wpf_c = np.stack([wkey // No, wkey % No], axis=2).astype(np.int32)

    gauge = types.Gauge(*(np.array([np.int32(getattr(lm.gauge, fld))
                                    for lm in lms], np.int32)
                          for fld in ("ref", "scap", "fix", "sign",
                                      "fref", "fscap", "ffix")))
    return types.LocalMap(
        pose_ids=pose_ids_c.astype(np.int32), poses=poses_c.astype(dtype),
        feat_ids=feat_ids_c.astype(np.int32), feats=feats_c.astype(dtype),
        U=Uc.astype(dtype), Uij=Uij_c, W=Wc.astype(dtype), Wpf=Wpf_c,
        V=V_c.astype(dtype),
        n_poses=m.astype(np.int32), n_feats=n.astype(np.int32),
        n_U=nU_c.astype(np.int32), n_W=nW_c.astype(np.int32),
        gauge=gauge,
    )


def stats(lm: types.LocalMap) -> dict:
    return dict(
        M=lm.M, N=lm.N, KU=lm.KU, KW=lm.KW,
        m=int(lm.n_poses), n=int(lm.n_feats),
        nU=int(np.any(np.asarray(lm.U) != 0, axis=(1, 2)).sum()),
        nW=int(np.any(np.asarray(lm.W) != 0, axis=(1, 2)).sum()),
    )
