"""Shared test utilities: random local maps + dense brute-force models.

The dense model mirrors the block semantics (symmetric completion,
scatter-add of duplicate coordinates) so any block-level implementation can be
checked against plain dense linear algebra.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from linearsfm_tpu import types
from linearsfm_tpu.ops import gauge as G


def densify_info(lm: types.LocalMap) -> np.ndarray:
    """Full symmetric information matrix [6M+3N, 6M+3N] from block lists."""
    M, N = lm.M, lm.N
    d = 6 * M + 3 * N
    I = np.zeros((d, d))
    U = np.asarray(lm.U)
    Uij = np.asarray(lm.Uij)
    for k in range(U.shape[0]):
        i, j = Uij[k]
        I[6 * i:6 * i + 6, 6 * j:6 * j + 6] += U[k]
        if i != j:
            I[6 * j:6 * j + 6, 6 * i:6 * i + 6] += U[k].T
    W = np.asarray(lm.W)
    Wpf = np.asarray(lm.Wpf)
    for k in range(W.shape[0]):
        p, f = Wpf[k]
        r0, c0 = 6 * p, 6 * M + 3 * f
        I[r0:r0 + 6, c0:c0 + 3] += W[k]
        I[c0:c0 + 3, r0:r0 + 6] += W[k].T
    V = np.asarray(lm.V)
    for f in range(N):
        c0 = 6 * M + 3 * f
        I[c0:c0 + 3, c0:c0 + 3] += V[f]
    return I


def state_vector(lm: types.LocalMap) -> np.ndarray:
    return np.concatenate([np.asarray(lm.poses).ravel(), np.asarray(lm.feats).ravel()])


def full_state_map_stereo(x_flat, M, N, ref_slot):
    """Whole-state transform as a function of the flat state (for jacfwd)."""
    poses = x_flat[: 6 * M].reshape(M, 6)
    feats = x_flat[6 * M:].reshape(N, 3)
    g = poses[ref_slot]
    new_poses = jax.vmap(G.stereo_pose_block, in_axes=(0, None))(poses, g)
    new_poses = new_poses.at[ref_slot].set(G.invpose(g))
    new_feats = jax.vmap(G.stereo_feat_block, in_axes=(0, None))(feats, g)
    return jnp.concatenate([new_poses.reshape(-1), new_feats.reshape(-1)])


def full_state_map_mono(x_flat, M, N, ref_slot, scap_slot, fix):
    poses = x_flat[: 6 * M].reshape(M, 6)
    feats = x_flat[6 * M:].reshape(N, 3)
    g = poses[ref_slot]
    s = poses[scap_slot, 0:3]
    new_poses = jax.vmap(G.mono_pose_block, in_axes=(0, None, None, None))(poses, g, s, fix)
    new_feats = jax.vmap(G.mono_feat_block, in_axes=(0, None, None, None))(feats, g, s, fix)
    return jnp.concatenate([new_poses.reshape(-1), new_feats.reshape(-1)])


def random_info_blocks(rng, M, N, obs_per_feat=3, extra_pose_links=2):
    """Random PSD block-sparse information from synthetic measurement Jacobians.

    Every pose gets a prior-ish diagonal block; each feature is observed from
    `obs_per_feat` random poses (3-row jacobian touching pose+feature), plus a
    few random pose-pose odometry-style links. Returns (U, Uij, W, Wpf, V) as
    numpy with one U entry per occupied pair (upper storage i<=j).
    """
    d = 6 * M + 3 * N
    I = np.zeros((d, d))
    # pose-pose odometry chain + extra links
    links = [(i, i + 1) for i in range(M - 1)]
    for _ in range(extra_pose_links):
        i, j = sorted(rng.choice(M, size=2, replace=False))
        links.append((i, j))
    for (i, j) in links:
        H = rng.standard_normal((6, 12))
        Ii = H.T @ H
        sl = np.r_[6 * i:6 * i + 6, 6 * j:6 * j + 6]
        I[np.ix_(sl, sl)] += Ii
    obs = []
    for f in range(N):
        ps = rng.choice(M, size=min(obs_per_feat, M), replace=False)
        for p in ps:
            H = rng.standard_normal((3, 9))
            Ii = H.T @ H
            sl = np.r_[6 * p:6 * p + 6, 6 * M + 3 * f:6 * M + 3 * f + 3]
            I[np.ix_(sl, sl)] += Ii
            obs.append((p, f))
    # small diagonal regularisation keeps it PD
    I += 1e-3 * np.eye(d)
    return dense_to_blocks(I, M, N)


def dense_to_blocks(I, M, N):
    """Extract (U, Uij, W, Wpf, V) block lists from a dense symmetric info."""
    U, Uij, W, Wpf, V = [], [], [], [], []
    for i in range(M):
        for j in range(i, M):
            B = I[6 * i:6 * i + 6, 6 * j:6 * j + 6]
            if np.any(B != 0):
                U.append(B.copy())
                Uij.append((i, j))
    for p in range(M):
        for f in range(N):
            B = I[6 * p:6 * p + 6, 6 * M + 3 * f:6 * M + 3 * f + 3]
            if np.any(B != 0):
                W.append(B.copy())
                Wpf.append((p, f))
    for f in range(N):
        V.append(I[6 * M + 3 * f:6 * M + 3 * f + 3, 6 * M + 3 * f:6 * M + 3 * f + 3].copy())
    return (np.array(U).reshape(-1, 6, 6), np.array(Uij).reshape(-1, 2),
            np.array(W).reshape(-1, 6, 3), np.array(Wpf).reshape(-1, 2),
            np.array(V).reshape(-1, 3, 3))


def random_stereo_map(rng, M=4, N=6, pose_id0=1, feat_id0=1000, ref_id=0):
    """Random stereo LocalMap. Pose ids pose_id0..; the reference pose (id
    ref_id) is implicit (not a slot), matching the raw localmap format."""
    U, Uij, W, Wpf, V = random_info_blocks(rng, M, N)
    poses = rng.standard_normal((M, 6))
    poses[:, 3:6] *= 0.5
    feats = rng.standard_normal((N, 3)) * 2.0
    return types.make_local_map(
        pose_ids=np.arange(pose_id0, pose_id0 + M),
        poses=poses,
        feat_ids=np.arange(feat_id0, feat_id0 + N),
        feats=feats,
        U=U, Uij=Uij, W=W, Wpf=Wpf, V=V,
        gauge=types.Gauge.stereo(ref_id),
    )


def random_mono_map(rng, M=4, N=6, pose_id0=0, feat_id0=1000, ref_id=None,
                    scap_id=None, fix=2):
    """Random mono LocalMap: reference pose IS a slot with value zero and zero
    information; the scale pose has its `fix` coordinate at +-1."""
    ref_id = pose_id0 if ref_id is None else ref_id
    scap_id = pose_id0 + 1 if scap_id is None else scap_id
    U, Uij, W, Wpf, V = random_info_blocks(rng, M, N)
    pose_ids = np.arange(pose_id0, pose_id0 + M)
    ref_slot = int(np.argmax(pose_ids == ref_id))
    scap_slot = int(np.argmax(pose_ids == scap_id))
    # zero out info touching the reference slot (it is the gauge)
    keep = ~((Uij[:, 0] == ref_slot) | (Uij[:, 1] == ref_slot))
    U, Uij = U[keep], Uij[keep]
    keepw = Wpf[:, 0] != ref_slot
    W, Wpf = W[keepw], Wpf[keepw]
    poses = rng.standard_normal((M, 6))
    poses[:, 3:6] *= 0.5
    poses[ref_slot] = 0.0
    sign = 1
    poses[scap_slot, fix] = sign
    feats = rng.standard_normal((N, 3)) * 2.0
    return types.make_local_map(
        pose_ids=pose_ids, poses=poses,
        feat_ids=np.arange(feat_id0, feat_id0 + N), feats=feats,
        U=U, Uij=Uij, W=W, Wpf=Wpf, V=V,
        gauge=types.Gauge.mono(ref_id, scap_id, fix, sign),
    )
