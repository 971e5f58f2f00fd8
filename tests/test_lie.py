import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdpl_slam_tpu.ops import lie


def random_twist(rng, scale=1.0):
    return jnp.asarray(rng.normal(size=6) * scale, dtype=jnp.float32)


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-7, 1e-3, 0.5, 2.0]:
        w = jnp.asarray(rng.normal(size=3), jnp.float32)
        w = w / jnp.linalg.norm(w) * scale
        R = lie.so3_exp(w)
        # orthonormality
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(lie.so3_log(R), w, atol=5e-4 * max(1.0, scale))


def test_se3_exp_log_roundtrip(rng):
    for scale in [1e-6, 0.1, 1.5]:
        xi = random_twist(rng, scale)
        # log is only defined for rotation angles < pi: clamp omega.
        w_norm = float(jnp.linalg.norm(xi[:3]))
        if w_norm > 3.0:
            xi = xi.at[:3].multiply(3.0 / w_norm)
        T = lie.se3_exp(xi)
        np.testing.assert_allclose(lie.se3_log(T), xi, rtol=2e-3, atol=1e-3)


def test_se3_inv(rng):
    T = lie.se3_exp(random_twist(rng))
    np.testing.assert_allclose(T @ lie.se3_inv(T), np.eye(4), atol=1e-5)


def test_exp_of_zero_is_identity():
    np.testing.assert_allclose(lie.se3_exp(jnp.zeros(6)), np.eye(4), atol=1e-7)


def test_grad_nan_free_at_zero():
    g = jax.grad(lambda xi: jnp.sum(lie.se3_exp(xi)))(jnp.zeros(6))
    assert np.all(np.isfinite(g))


def test_rotation_angle_deg(rng):
    w = jnp.asarray([0.0, 0.3, 0.0], jnp.float32)
    R = lie.so3_exp(w)
    np.testing.assert_allclose(lie.rotation_angle_deg(R), np.degrees(0.3), rtol=1e-4)


def test_transform_point_matches_matmul(rng):
    T = lie.se3_exp(random_twist(rng))
    x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    xh = jnp.concatenate([x, jnp.ones((5, 1))], axis=1)
    expected = (xh @ np.asarray(T).T)[:, :3]
    np.testing.assert_allclose(lie.transform_point(T, x), expected, atol=1e-5)


def test_line_transform_6x6_matches_pointwise(rng):
    """Transforming a Pluecker line with the 6x6 matrix must agree with
    recomputing Pluecker coords from transformed endpoints."""
    from sdpl_slam_tpu.ops import geometry

    T = lie.se3_exp(random_twist(rng, 0.5))
    p = jnp.asarray(rng.normal(size=3), jnp.float32)
    q = jnp.asarray(rng.normal(size=3), jnp.float32)
    L = geometry.plucker_from_endpoints(p, q)
    L_t = lie.line_transform_6x6(T) @ L
    L_direct = geometry.plucker_from_endpoints(
        lie.transform_point(T, p), lie.transform_point(T, q)
    )
    np.testing.assert_allclose(L_t, L_direct, atol=1e-4)
