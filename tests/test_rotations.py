import numpy as np
import jax
import jax.numpy as jnp

from linearsfm_tpu.ops import rotations as rot


def test_euler_roundtrip():
    rng = np.random.default_rng(0)
    abg = rng.uniform(-1.2, 1.2, size=(100, 3))  # beta away from +-pi/2
    R = rot.euler_to_r(jnp.asarray(abg))
    back = rot.r_to_euler(R)
    np.testing.assert_allclose(np.asarray(back), abg, atol=1e-12)


def test_euler_to_r_orthonormal():
    rng = np.random.default_rng(1)
    abg = rng.uniform(-np.pi, np.pi, size=(50, 3))
    R = np.asarray(rot.euler_to_r(jnp.asarray(abg)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-12)


def test_euler_convention_matches_reference_formula():
    # R = Rx(g) Ry(b) Rz(a), row entries per LinearSFMImp.cpp:132-143.
    a, b, g = 0.3, -0.7, 1.1
    R = np.asarray(rot.euler_to_r(jnp.array([a, b, g])))
    ca, sa, cb, sb, cg, sg = np.cos(a), np.sin(a), np.cos(b), np.sin(b), np.cos(g), np.sin(g)
    expected = np.array([
        [cb * ca, cb * sa, -sb],
        [sg * sb * ca - cg * sa, sg * sb * sa + cg * ca, sg * cb],
        [cg * sb * ca + sg * sa, cg * sb * sa - sg * ca, cg * cb],
    ])
    np.testing.assert_allclose(R, expected, atol=1e-15)


def test_r_to_euler_t_is_transpose_extraction():
    rng = np.random.default_rng(2)
    abg = rng.uniform(-1.2, 1.2, size=(20, 3))
    R = rot.euler_to_r(jnp.asarray(abg))
    e1 = rot.r_to_euler_t(R)
    e2 = rot.r_to_euler(jnp.swapaxes(R, -1, -2))
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=0)


def test_r_to_euler_grad_finite():
    # autodiff through extraction matches finite differences
    abg0 = jnp.array([0.2, -0.4, 0.9])

    def f(abg):
        return rot.r_to_euler(rot.euler_to_r(abg))

    J = jax.jacfwd(f)(abg0)
    np.testing.assert_allclose(np.asarray(J), np.eye(3), atol=1e-8)


def test_wrap_angle():
    # the reference's single-step truncation wrap is only exact for |x| < 2*pi
    # (LinearSFMImp.cpp:7433-7457); angles here come from atan2 + small drift.
    x = jnp.array([0.0, 3.2, -3.3, 6.0, -6.0, 3.15])
    w = np.asarray(rot.wrap_angle_pi(x))
    assert np.all(w <= rot.REF_PI + 1e-9) and np.all(w >= -rot.REF_PI - 1e-9)
    # equivalent angle modulo 2*pi(ref)
    np.testing.assert_allclose(np.cos(w) - np.cos(np.asarray(x)), 0, atol=1e-6)
