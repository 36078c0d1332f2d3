"""Device-side (jit-able, static-shape) map compaction.

Same semantics as the host compaction in core/compact.py — gather valid
poses/features to the front, merge duplicate block coordinates, drop
exact-zero blocks — but expressed with sorts + segment scatters so a whole
tree level (join + re-gauge + compact) runs as ONE XLA program with the maps
never leaving the device. This replaces the reference's malloc/free map
lifecycle (/root/reference/linux/src/LinearSFMImp/LinearSFMImp.cpp:1971-1986)
on the device-resident execution path (core/device_tree.py).

All output capacities are static arguments; callers guarantee the valid
counts fit (see core/plan.py for the capacity arithmetic).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .. import types


def _valid_first_perm(valid):
    """Stable permutation putting True entries first.

    Returns (perm[M] old-slot-in-new-order, inv[M] old->new with dead slots
    mapped to M)."""
    M = valid.shape[0]
    perm = jnp.argsort(jnp.where(valid, 0, 1).astype(jnp.int32), stable=True)
    inv = jnp.zeros(M, jnp.int32).at[perm].set(jnp.arange(M, dtype=jnp.int32))
    inv = jnp.where(valid, inv, M)
    return perm, inv


def _gather_front(x, perm, out_cap: int, fill=0):
    """new[k] = x[perm[k]] for k < len(perm), `fill` beyond."""
    n = perm.shape[0]
    take = min(n, out_cap)
    out = jnp.full((out_cap,) + x.shape[1:], fill, x.dtype)
    return out.at[:take].set(x[perm[:take]])


def _merge_blocks(blocks, keys, entry_valid, out_cap: int):
    """Sort blocks by key, segment-sum duplicates, compact valid-first.

    keys: int32[K] (< BIG for valid); entry_valid: bool[K].
    Returns (blocks_out[out_cap,...], keys_out[out_cap] (-1 padding), n_out).
    """
    K = keys.shape[0]
    BIG = jnp.iinfo(jnp.int32).max
    key = jnp.where(entry_valid, keys, BIG)
    order = jnp.argsort(key, stable=True)
    ks = key[order]
    bs = blocks[order]
    vs = entry_valid[order]
    start = jnp.concatenate([jnp.ones((1,), bool), ks[1:] != ks[:-1]])
    seg = jnp.cumsum(start.astype(jnp.int32)) - 1
    tgt = jnp.where(vs, seg, out_cap)
    out = jnp.zeros((out_cap,) + blocks.shape[1:], blocks.dtype)
    out = out.at[tgt].add(jnp.where(vs[(...,) + (None,) * (bs.ndim - 1)], bs, 0),
                          mode="drop")
    ktgt = jnp.where(vs & start, seg, out_cap)
    kout = jnp.full((out_cap,), -1, jnp.int32)
    kout = kout.at[ktgt].set(ks, mode="drop")
    n_out = jnp.sum((vs & start).astype(jnp.int32))
    return out, kout, n_out


def compact_device(lm: types.LocalMap, Mo: int, No: int, KUo: int,
                   KWo: int) -> tuple[types.LocalMap, jax.Array]:
    """Compact `lm` into fresh capacities (Mo, No, KUo, KWo) on device.

    Returns (compacted map, max_obs) where max_obs is the largest number of
    distinct observing poses of any feature (sizes the grouped-Schur bound of
    the NEXT join, cf. TreeSolver._max_obs_per_feature).
    """
    M, N = lm.M, lm.N
    pvalid = lm.pose_mask()
    fvalid = lm.feat_mask()
    pperm, pinv = _valid_first_perm(pvalid)
    fperm, finv = _valid_first_perm(fvalid)

    pose_ids = _gather_front(lm.pose_ids, pperm, Mo, -1)
    poses = _gather_front(lm.poses, pperm, Mo, 0.0)
    feat_ids = _gather_front(lm.feat_ids, fperm, No, -1)
    feats = _gather_front(lm.feats, fperm, No, 0.0)
    V = _gather_front(lm.V, fperm, No, 0.0)

    # ---- U: canonical upper (i<=j), merged --------------------------------
    ui = pinv[jnp.clip(lm.Uij[:, 0], 0, M - 1)]
    uj = pinv[jnp.clip(lm.Uij[:, 1], 0, M - 1)]
    u_ok = (jnp.any(lm.U != 0, axis=(1, 2)) & (ui < Mo) & (uj < Mo)
            & (ui < M) & (uj < M))
    lower = ui > uj
    i2 = jnp.where(lower, uj, ui)
    j2 = jnp.where(lower, ui, uj)
    Ub = jnp.where(lower[:, None, None], jnp.swapaxes(lm.U, 1, 2), lm.U)
    Um, ukey, nU = _merge_blocks(Ub, i2 * Mo + j2, u_ok, KUo)
    Uij = jnp.stack([jnp.where(ukey >= 0, ukey // Mo, 0),
                     jnp.where(ukey >= 0, ukey % Mo, 0)], axis=1)

    # ---- W ------------------------------------------------------------------
    wp = pinv[jnp.clip(lm.Wpf[:, 0], 0, M - 1)]
    wf = finv[jnp.clip(lm.Wpf[:, 1], 0, N - 1)]
    w_ok = (jnp.any(lm.W != 0, axis=(1, 2)) & (wp < Mo) & (wf < No)
            & (wp < M) & (wf < N))
    Wm, wkey, nW = _merge_blocks(lm.W, wp * No + wf, w_ok, KWo)
    Wpf = jnp.stack([jnp.where(wkey >= 0, wkey // No, 0),
                     jnp.where(wkey >= 0, wkey % No, 0)], axis=1)

    # ---- per-feature observation counts (post-merge) -----------------------
    wvalid = wkey >= 0
    obs = jnp.zeros(No + 1, jnp.int32).at[
        jnp.where(wvalid, Wpf[:, 1], No)].add(1, mode="drop")
    max_obs = jnp.max(obs[:No])

    out = types.LocalMap(
        pose_ids=pose_ids, poses=poses, feat_ids=feat_ids, feats=feats,
        U=Um, Uij=Uij, W=Wm, Wpf=Wpf, V=V,
        n_poses=jnp.sum(pvalid.astype(jnp.int32)),
        n_feats=jnp.sum(fvalid.astype(jnp.int32)),
        n_U=nU, n_W=nW, gauge=lm.gauge,
    )
    return out, max_obs
