import jax
import jax.numpy as jnp
import numpy as np

from sdpl_slam_tpu.ops import geometry, lie

K = geometry.Intrinsics(
    jnp.float32(721.5377), jnp.float32(721.5377),
    jnp.float32(609.5593), jnp.float32(172.8540),
)


def test_project_backproject_roundtrip(rng):
    uv = jnp.asarray(rng.uniform([0, 0], [1242, 375], size=(100, 2)), jnp.float32)
    z = jnp.asarray(rng.uniform(1.0, 40.0, size=100), jnp.float32)
    X = geometry.backproject(K, uv, z)
    np.testing.assert_allclose(geometry.project(K, X), uv, atol=1e-2)
    np.testing.assert_allclose(X[:, 2], z)


def test_plucker_from_endpoints_properties(rng):
    p = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(10, 3)), jnp.float32)
    L = geometry.plucker_from_endpoints(p, q)
    n, d = L[:, :3], L[:, 3:]
    # d unit, n orthogonal to d, both endpoints at zero distance
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.sum(n * d, axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(geometry.point_to_plucker_distance(p, L), 0.0, atol=1e-4)
    np.testing.assert_allclose(geometry.point_to_plucker_distance(q, L), 0.0, atol=1e-4)


def test_point_to_plucker_distance_known():
    # Line along z through (1, 0, 0); point at (0, 0, 5) is distance 1 away.
    L = geometry.plucker_from_endpoints(
        jnp.array([1.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 1.0])
    )
    d = geometry.point_to_plucker_distance(jnp.array([0.0, 0.0, 5.0]), L)
    np.testing.assert_allclose(d, 1.0, atol=1e-5)


def test_orthonormal_roundtrip(rng):
    p = jnp.asarray(rng.normal(size=(8, 3)) * 2, jnp.float32)
    q = jnp.asarray(rng.normal(size=(8, 3)) * 2, jnp.float32)
    L = geometry.plucker_from_endpoints(p, q)
    U, w = geometry.plucker_to_orthonormal(L)
    L2 = geometry.orthonormal_to_plucker(U, w)
    # Orthonormal repr recovers the line up to scale: same normalized coords.
    scale = np.linalg.norm(np.asarray(L), axis=1, keepdims=True)
    np.testing.assert_allclose(
        np.asarray(L) / scale,
        np.asarray(L2) / np.linalg.norm(np.asarray(L2), axis=1, keepdims=True),
        atol=1e-4,
    )
    # U orthonormal
    UtU = jnp.einsum("bij,bik->bjk", U, U)
    np.testing.assert_allclose(UtU, np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)


def test_orthonormal_retract_stays_on_manifold(rng):
    L = geometry.plucker_from_endpoints(
        jnp.asarray(rng.normal(size=3), jnp.float32),
        jnp.asarray(rng.normal(size=3), jnp.float32),
    )
    U, w = geometry.plucker_to_orthonormal(L)
    delta = jnp.asarray(rng.normal(size=4) * 0.1, jnp.float32)
    U2, w2 = geometry.orthonormal_retract(U, w, delta)
    np.testing.assert_allclose(U2 @ U2.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(jnp.linalg.norm(w2), 1.0, atol=1e-5)
    # zero delta is identity
    U3, w3 = geometry.orthonormal_retract(U, w, jnp.zeros(4))
    np.testing.assert_allclose(U3, U, atol=1e-6)
    np.testing.assert_allclose(w3, w, atol=1e-6)


def test_plucker_line_distance_branches(rng):
    # identical lines -> 0 (collinear branch)
    L = geometry.plucker_from_endpoints(
        jnp.array([1.0, 2.0, 3.0]), jnp.array([2.0, 2.0, 3.0])
    )
    np.testing.assert_allclose(geometry.plucker_line_distance(L, L), 0.0, atol=1e-5)

    # parallel lines offset by 1 -> distance 1 (collinear branch)
    L2 = geometry.plucker_from_endpoints(
        jnp.array([1.0, 3.0, 3.0]), jnp.array([2.0, 3.0, 3.0])
    )
    np.testing.assert_allclose(geometry.plucker_line_distance(L, L2), 1.0, atol=1e-4)

    # skew perpendicular lines: x-axis and the line {z=1, x=0} along y -> 1
    Lx = geometry.plucker_from_endpoints(
        jnp.array([0.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0])
    )
    Ly = geometry.plucker_from_endpoints(
        jnp.array([0.0, 0.0, 1.0]), jnp.array([0.0, 1.0, 1.0])
    )
    np.testing.assert_allclose(geometry.plucker_line_distance(Lx, Ly), 1.0, atol=1e-5)
    np.testing.assert_allclose(geometry.plucker_angle_error(Lx, Ly), 1.0, atol=1e-5)
    np.testing.assert_allclose(geometry.plucker_angle_error(Lx, Lx), 0.0, atol=1e-5)


def test_plucker_line_distance_grad_finite(rng):
    L1 = geometry.plucker_from_endpoints(
        jnp.asarray(rng.normal(size=3), jnp.float32),
        jnp.asarray(rng.normal(size=3), jnp.float32),
    )
    g = jax.grad(lambda l: geometry.plucker_line_distance(l, L1))(L1 + 0.1)
    assert np.all(np.isfinite(g))
    # collinear case must also be NaN-free
    g2 = jax.grad(lambda l: geometry.plucker_line_distance(l, L1))(L1)
    assert np.all(np.isfinite(g2))


def test_infinite_line_image(rng):
    p = jnp.array([100.0, 50.0])
    q = jnp.array([200.0, 80.0])
    l = geometry.infinite_line_image(p, q)
    np.testing.assert_allclose(geometry.point_to_image_line(p, l), 0.0, atol=1e-4)
    np.testing.assert_allclose(geometry.point_to_image_line(q, l), 0.0, atol=1e-4)
    np.testing.assert_allclose(jnp.linalg.norm(l), 1.0, atol=1e-6)


def test_transform_plucker_matches_endpoints(rng):
    T = lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.3, jnp.float32))
    p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    L = geometry.plucker_from_endpoints(p, q)
    Lt = geometry.transform_plucker(T, L)
    Ld = geometry.plucker_from_endpoints(
        lie.transform_point(T, p), lie.transform_point(T, q)
    )
    np.testing.assert_allclose(Lt, Ld, atol=1e-4)
