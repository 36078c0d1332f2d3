"""Feature-sharded Schur assembly — the TP-analog axis for big root joins.

The root joins of NC3500-scale trees have tens of thousands of landmark
blocks; their Schur contributions ``sum_f W_f Vinv_f W_f^T`` dominate the
assembly cost. Here the feature axis is sharded over a mesh axis: each device
computes the partial reduced camera system for its feature shard and the
partials are `psum`'d over ICI; the dense Cholesky then runs replicated (the
MXU eats it), and feature back-substitution is sharded again.

Semantically identical to ops/schur.py's single-device path (tested against
it); use for single-pair (root) joins, not inside vmapped levels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import schur


def _partial_schur(U, Uij, Wg, pg, valid, Vinv_g, M):
    """Dense S contribution of a feature shard (grouped arrays)."""
    dtype = U.dtype
    S = jnp.zeros((M, 6, M, 6), dtype)
    ui, uj = Uij[:, 0], Uij[:, 1]
    # U scatter happens on device 0's shard only (replicated inputs would
    # double count under psum) — callers pass zeroed U to other shards.
    S = S.at[ui, :, uj, :].add(U)
    S = S.at[uj, :, ui, :].add(
        jnp.where((ui != uj)[:, None, None], jnp.swapaxes(U, 1, 2), 0.0))

    Wg = Wg * valid[..., None, None]
    Yg = jnp.einsum("nofk,nkl->nofl", Wg, Vinv_g)
    C = jnp.einsum("nofk,npgk->nopfg", Yg, Wg)
    po = jnp.broadcast_to(pg[:, :, None], C.shape[:3])
    pp = jnp.broadcast_to(pg[:, None, :], C.shape[:3])
    S = S.at[po.reshape(-1), :, pp.reshape(-1), :].add(-C.reshape(-1, 6, 6))
    return S.reshape(6 * M, 6 * M)


def sharded_schur_solve(U, Uij, W, Wpf, V, eP, eF, M: int, max_obs: int,
                        mesh: Mesh, axis: str = "fs", fixed_mask=None,
                        method: str = "direct", refine_iters: int = 3):
    """Assemble S/E with the feature axis sharded over `mesh`, solve, and
    back-substitute features. Returns (x_poses[M,6], x_feats[N,3]).
    """
    N = V.shape[0]
    ndev = mesh.devices.size
    Npad = ((N + ndev - 1) // ndev) * ndev

    Vinv = schur.inv3x3_sym(V)
    entry_valid = jnp.any(W != 0, axis=(1, 2))
    entry, valid, overflowed = schur.group_by_feature(
        Wpf, N, max_obs, entry_valid=entry_valid)
    # Undersized max_obs would silently drop Schur terms; poison instead.
    Wg = W[entry] * jnp.where(overflowed, jnp.nan, 1.0).astype(W.dtype)
    pg = Wpf[:, 0][entry]               # [N, O]

    def padf(x):
        pad = [(0, Npad - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad)

    Wg, pg, valid, Vinv_p, eF_p = padf(Wg), padf(pg), padf(valid), padf(Vinv), padf(eF)

    # RHS: E = eP - sum_entries (W Vinv) eF  (feature-sharded via the groups)
    def shard_fn(Wg_s, pg_s, valid_s, Vinv_s, eF_s, U_s, Uij_s):
        U_s, Uij_s = U_s[0], Uij_s[0]   # drop the sharded device axis
        S_part = _partial_schur(U_s, Uij_s, Wg_s, pg_s, valid_s, Vinv_s, M)
        Y = jnp.einsum("nofk,nkl->nofl", Wg_s * valid_s[..., None, None], Vinv_s)
        e_part = jax.ops.segment_sum(
            jnp.einsum("nofk,nk->nof", Y, eF_s).reshape(-1, 6),
            pg_s.reshape(-1), num_segments=M)
        S_full = jax.lax.psum(S_part, axis)
        e_full = jax.lax.psum(e_part, axis)
        return S_full, e_full

    # Give the U blocks to shard 0 only (avoid double counting under psum).
    shard_id = jnp.arange(ndev)
    U_sh = jnp.where((shard_id == 0)[:, None, None, None],
                     jnp.broadcast_to(U, (ndev,) + U.shape), 0.0)
    Uij_sh = jnp.broadcast_to(Uij, (ndev,) + Uij.shape)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P()), check_vma=False)
    S, WVe = fn(Wg, pg, valid, Vinv_p, eF_p, U_sh, Uij_sh)
    E = (eP - WVe).reshape(-1)

    from ..ops import solve as solve_mod
    x = solve_mod.solve_reduced(S, E, fixed_mask=fixed_mask, method=method,
                                refine_iters=refine_iters)
    xp = x.reshape(M, 6)

    # feature backsub, sharded over the same feature axis
    def back_fn(Wg_s, pg_s, valid_s, Vinv_s, eF_s):
        xg = xp[pg_s]                                 # [n, O, 6]
        wtx = jnp.einsum("nofk,nof->nk", Wg_s * valid_s[..., None, None], xg)
        return jnp.einsum("nkl,nl->nk", Vinv_s, eF_s - wtx)

    bf = jax.shard_map(back_fn, mesh=mesh,
                       in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
                       out_specs=P(axis), check_vma=False)
    xf = bf(Wg, pg, valid, Vinv_p, eF_p)[:N]
    return xp, xf
