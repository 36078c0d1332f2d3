"""Gauge-transform correctness: involution + dense brute-force congruence."""

import numpy as np
import jax
import jax.numpy as jnp

import helpers as H
from linearsfm_tpu.ops import congruence as C
from linearsfm_tpu.ops import gauge as G


def _dense_congruence(lm_new, full_map, jac_args, I_old):
    """I' = J^T I J with J = d(old)/d(new) = jacfwd of the inverse map, which
    by the involution property is `full_map` evaluated at the new state with
    the old gauge parameters."""
    x_new = H.state_vector(lm_new)
    J = np.asarray(jax.jacfwd(lambda x: full_map(x, *jac_args))(jnp.asarray(x_new)))
    return J.T @ I_old @ J


def test_stereo_transform_involution():
    rng = np.random.default_rng(3)
    lm = H.random_stereo_map(rng, M=5, N=7, pose_id0=1, ref_id=0)
    new_ref = 3  # transform into frame of pose id 3
    out = C.transform_map_stereo(lm, new_ref)
    assert int(out.gauge.ref) == new_ref
    # old ref id (0) now appears as an explicit pose slot
    assert 0 in np.asarray(out.pose_ids)
    # transform back
    back = C.transform_map_stereo(out, 0)
    order0 = np.argsort(np.asarray(lm.pose_ids))
    order1 = np.argsort(np.asarray(back.pose_ids))
    np.testing.assert_allclose(
        np.asarray(back.poses)[order1], np.asarray(lm.poses)[order0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(back.feats), np.asarray(lm.feats), atol=1e-9)
    # information round-trips too
    np.testing.assert_allclose(
        H.densify_info(back), H.densify_info(lm), atol=1e-6, rtol=1e-6)


def test_stereo_congruence_matches_dense():
    rng = np.random.default_rng(4)
    lm = H.random_stereo_map(rng, M=5, N=7, pose_id0=1, ref_id=0)
    I_old = H.densify_info(lm)
    new_ref = 4
    out = C.transform_map_stereo(lm, new_ref)

    r_slot = int(np.argmax(np.asarray(out.pose_ids) == 0))
    I_expect = _dense_congruence(out, H.full_state_map_stereo,
                                 (lm.M, lm.N, r_slot), I_old)
    I_got = H.densify_info(out)
    np.testing.assert_allclose(I_got, I_expect, atol=1e-7, rtol=1e-7)


def test_mono_transform_involution():
    rng = np.random.default_rng(5)
    lm = H.random_mono_map(rng, M=5, N=7, pose_id0=0, fix=2)
    out = C.transform_map_mono(lm, 3, 4, 1)  # new gauge: ref=3, scap=4, fix=1
    # gauge pinning
    ids = np.asarray(out.pose_ids)
    rs = int(np.argmax(ids == 3))
    ss = int(np.argmax(ids == 4))
    np.testing.assert_allclose(np.asarray(out.poses)[rs], 0, atol=0)
    assert abs(abs(float(out.poses[ss, 1])) - 1.0) < 1e-12
    back = C.transform_map_mono(out, 0, 1, 2)
    np.testing.assert_allclose(np.asarray(back.poses), np.asarray(lm.poses), atol=1e-9)
    np.testing.assert_allclose(np.asarray(back.feats), np.asarray(lm.feats), atol=1e-9)
    # The mono transform collapses the 7 gauge dimensions (ref pose block +
    # pinned scale coordinate): the composite T2.T1 is the identity only on
    # the gauge-constraint manifold, so only the gauge-REDUCED information is
    # preserved — which is exactly what the solver consumes
    # (lmj_solveLinearSFMMono deletes those 7 rows/cols, LinearSFMImp.cpp:6981-7021).
    I0, I2 = H.densify_info(lm), H.densify_info(back)
    ids = np.asarray(lm.pose_ids)
    rs = int(np.argmax(ids == 0))
    ss = int(np.argmax(ids == 1))
    keep = np.ones(I0.shape[0], bool)
    keep[6 * rs:6 * rs + 6] = False
    keep[6 * ss + 2] = False  # fix = 2
    np.testing.assert_allclose(I2[np.ix_(keep, keep)], I0[np.ix_(keep, keep)],
                               atol=1e-6, rtol=1e-6)


def test_mono_congruence_matches_dense():
    rng = np.random.default_rng(6)
    lm = H.random_mono_map(rng, M=5, N=7, pose_id0=0, fix=2)
    I_old = H.densify_info(lm)
    new_ref, new_scap, new_fix = 2, 3, 0
    out = C.transform_map_mono(lm, new_ref, new_scap, new_fix)

    ids = np.asarray(out.pose_ids)
    r_slot = int(np.argmax(ids == 0))   # old ref id
    s_slot = int(np.argmax(ids == 1))   # old scap id
    x_new = H.state_vector(out)
    J = np.array(jax.jacfwd(
        lambda x: H.full_state_map_mono(x, lm.M, lm.N, r_slot, s_slot, 2)
    )(jnp.asarray(x_new)))
    # gauge-conditioning projection: the reference zeroes the J columns of
    # the NEW gauge coordinates (LinearSFMImp.cpp:3691-3710)
    p1 = int(np.argmax(ids == new_ref))
    p2 = int(np.argmax(ids == new_scap))
    J[:, 6 * p1:6 * p1 + 6] = 0.0
    J[:, 6 * p2 + new_fix] = 0.0
    I_expect = J.T @ I_old @ J
    I_got = H.densify_info(out)
    np.testing.assert_allclose(I_got, I_expect, atol=1e-7, rtol=1e-7)


def test_mono_state_transform_scale():
    rng = np.random.default_rng(7)
    lm = H.random_mono_map(rng, M=4, N=5, pose_id0=0, fix=2)
    poses, feats, sign = G.transform_state_mono(
        lm.pose_ids, lm.poses, lm.feats, 2, 3, 1)
    # the new scap (id 3) pinned coordinate is +-1
    ss = int(np.argmax(np.asarray(lm.pose_ids) == 3))
    assert abs(abs(float(poses[ss, 1])) - 1.0) < 1e-12
