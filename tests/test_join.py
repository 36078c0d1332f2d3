"""Pairwise join vs brute-force dense information fusion."""

import numpy as np
import jax.numpy as jnp

import helpers as H
from linearsfm_tpu import types
from linearsfm_tpu.core import join as J
from linearsfm_tpu.ops.rotations import REF_PI


def _dense_fuse(maps, slot_of_pose, slot_of_feat, Mo, No, drop_pose_slots=(),
                fixed_coords=(), drop_feat_slots=()):
    """x* = (sum I_k)^{-1} (sum I_k x_k) on the union index space."""
    d = 6 * Mo + 3 * No
    I_tot = np.zeros((d, d))
    e_tot = np.zeros(d)
    for lm, pmap, fmap in maps:
        I = H.densify_info(lm)
        x = H.state_vector(lm)
        # selection matrix local -> union
        sel = np.zeros((6 * lm.M + 3 * lm.N, d))
        for i in range(lm.M):
            if int(lm.pose_ids[i]) < 0 or pmap[i] < 0:
                continue
            sel[6 * i:6 * i + 6, 6 * pmap[i]:6 * pmap[i] + 6] = np.eye(6)
        for f in range(lm.N):
            if int(lm.feat_ids[f]) < 0 or fmap[f] < 0:
                continue
            sel[6 * lm.M + 3 * f: 6 * lm.M + 3 * f + 3,
                6 * Mo + 3 * fmap[f]: 6 * Mo + 3 * fmap[f] + 3] = np.eye(3)
        I_tot += sel.T @ I @ sel
        e_tot += sel.T @ (I @ x)
    keep = np.ones(d, bool)
    for s in drop_pose_slots:
        keep[6 * s:6 * s + 6] = False
    for s in drop_feat_slots:
        keep[6 * Mo + 3 * s: 6 * Mo + 3 * s + 3] = False
    for c, v in fixed_coords:
        keep[c] = False
        e_tot = e_tot - I_tot[:, c] * v  # condition on the pinned value
    xs = np.zeros(d)
    xs[keep] = np.linalg.solve(I_tot[np.ix_(keep, keep)], e_tot[keep])
    for c, v in fixed_coords:
        xs[c] = v
    return xs


def test_join_stereo_matches_dense():
    rng = np.random.default_rng(10)
    # two maps in the same gauge; features 1000..1005 in A, 1003..1009 in B.
    a = H.random_stereo_map(rng, M=3, N=6, pose_id0=1, feat_id0=1000, ref_id=0)
    b = H.random_stereo_map(rng, M=3, N=7, pose_id0=10, feat_id0=1003, ref_id=0)
    out = J.join_stereo(a, b, J.JoinConfig(max_obs=8))

    # union maps: pose slot = position in out
    ids_out = np.asarray(out.pose_ids)
    fids_out = np.asarray(out.feat_ids)
    pmap_a = [list(ids_out).index(int(i)) for i in np.asarray(a.pose_ids)]
    pmap_b = [list(ids_out).index(int(i)) for i in np.asarray(b.pose_ids)]
    fmap_a = [list(fids_out).index(int(i)) for i in np.asarray(a.feat_ids)]
    fmap_b = [list(fids_out).index(int(i)) for i in np.asarray(b.feat_ids)]
    xs = _dense_fuse([(a, pmap_a, fmap_a), (b, pmap_b, fmap_b)], None, None,
                     out.M, out.N,
                     drop_feat_slots=[f for f in range(out.N) if fids_out[f] < 0])

    got_p = np.asarray(out.poses).reshape(-1)
    got_f = np.asarray(out.feats)
    np.testing.assert_allclose(got_p, xs[:6 * out.M], atol=1e-8)
    # only valid features are meaningful
    nf = int(out.n_feats)
    assert nf == 6 + 7 - 3  # ids 1003,1004,1005 shared
    for f in range(out.N):
        if fids_out[f] >= 0:
            np.testing.assert_allclose(
                got_f[f], xs[6 * out.M + 3 * f: 6 * out.M + 3 * f + 3], atol=1e-8)


def test_join_stereo_feature_counts():
    rng = np.random.default_rng(11)
    a = H.random_stereo_map(rng, M=2, N=4, pose_id0=1, feat_id0=1000, ref_id=0)
    b = H.random_stereo_map(rng, M=2, N=4, pose_id0=5, feat_id0=1002, ref_id=0)
    out = J.join_stereo(a, b)
    assert int(out.n_feats) == 4 + 4 - 2
    fids = np.asarray(out.feat_ids)
    valid = fids[fids >= 0]
    assert sorted(valid.tolist()) == [1000, 1001, 1002, 1003, 1004, 1005]
    assert len(valid) == int(out.n_feats)


def test_join_mono_matches_dense():
    rng = np.random.default_rng(12)
    # both maps in gauge (ref=0, scap=1, fix=2); shared poses 0,1 + shared feats
    a = H.random_mono_map(rng, M=4, N=6, pose_id0=0, feat_id0=1000, fix=2)
    b = H.random_mono_map(rng, M=4, N=6, pose_id0=0, feat_id0=1003, fix=2)
    # make b's non-gauge pose ids distinct from a's (2,3 -> 12,13)
    import dataclasses
    b = dataclasses.replace(
        b, pose_ids=jnp.asarray(np.array([0, 1, 12, 13]), jnp.int32))
    out = J.join_mono(a, b, J.JoinConfig(max_obs=10))

    ids_out = np.asarray(out.pose_ids)
    fids_out = np.asarray(out.feat_ids)

    def pmap(lm):
        res = []
        for i in np.asarray(lm.pose_ids):
            res.append(list(ids_out).index(int(i)) if int(i) in ids_out.tolist() else -1)
        return res

    # b's ref(0)/scap(1) slots are dead; they map to a's slots
    pmap_a = pmap(a)
    pmap_b = []
    for i in np.asarray(b.pose_ids):
        pmap_b.append(list(ids_out).index(int(i)))
    fmap_a = [list(fids_out).index(int(i)) for i in np.asarray(a.feat_ids)]
    fmap_b = [list(fids_out).index(int(i)) for i in np.asarray(b.feat_ids)]

    # dense model: drop ref-touching blocks first (zero-info reference)
    def dropped(lm):
        rs = int(np.argmax(np.asarray(lm.pose_ids) == 0))
        keep = ~((np.asarray(lm.Uij)[:, 0] == rs) | (np.asarray(lm.Uij)[:, 1] == rs))
        keepw = np.asarray(lm.Wpf)[:, 0] != rs
        import dataclasses as dc
        return dc.replace(lm,
                          U=jnp.asarray(np.asarray(lm.U) * keep[:, None, None]),
                          W=jnp.asarray(np.asarray(lm.W) * keepw[:, None, None]))

    ref_union = int(np.argmax(ids_out == 0))
    scap_union = int(np.argmax(ids_out == 1))
    xs = _dense_fuse(
        [(dropped(a), pmap_a, fmap_a), (dropped(b), pmap_b, fmap_b)],
        None, None, out.M, out.N,
        drop_pose_slots=[ref_union] + [i for i in range(out.M) if ids_out[i] < 0],
        fixed_coords=[(6 * scap_union + 2, 1.0)],  # pinned at sign=+1
        drop_feat_slots=[f for f in range(out.N) if fids_out[f] < 0],
    )

    got_p = np.asarray(out.poses).reshape(-1)
    np.testing.assert_allclose(got_p, xs[:6 * out.M], atol=1e-8)
    for f in range(out.N):
        if fids_out[f] >= 0:
            np.testing.assert_allclose(
                np.asarray(out.feats)[f],
                xs[6 * out.M + 3 * f: 6 * out.M + 3 * f + 3], atol=1e-8)
