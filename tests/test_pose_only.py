import jax
import jax.numpy as jnp
import numpy as np

from sdpl_slam_tpu.ops import geometry, lie
from sdpl_slam_tpu.solvers import frame_solvers as fs

K = geometry.Intrinsics(
    jnp.float32(721.5377), jnp.float32(721.5377),
    jnp.float32(609.5593), jnp.float32(172.8540),
)


def scene(rng, n, T_true):
    uv = jnp.asarray(rng.uniform([100, 50], [1142, 325], (n, 2)), jnp.float32)
    z = jnp.asarray(rng.uniform(3, 30, n), jnp.float32)
    X = geometry.backproject(K, uv, z)
    cur = geometry.project(K, lie.transform_point(T_true, X))
    return X, cur


def empty_lines(m=8):
    return (jnp.ones((m, 3), jnp.float32), jnp.ones((m, 3), jnp.float32),
            jnp.zeros((m, 3), jnp.float32), jnp.zeros(m, bool))


def test_pose_only_recovers(rng):
    T_true = lie.se3_exp(jnp.array([0.01, -0.02, 0.01, 0.2, 0.1, 0.5], jnp.float32))
    X, cur = scene(rng, 200, T_true)
    ls, le, lc, lv = empty_lines()
    res = fs.solve_pose_only(
        jnp.eye(4, dtype=jnp.float32), X, cur, jnp.ones(200, bool),
        ls, le, lc, lv, K, use_lines=False,
    )
    E = np.asarray(res.pose @ lie.se3_inv(T_true))
    assert np.linalg.norm(E[:3, 3]) < 1e-3
    assert int(res.point_inlier.sum()) == 200


def test_pose_only_gates_outliers(rng):
    T_true = lie.se3_exp(jnp.array([0.0, 0.01, 0.0, 0.1, 0.0, 0.4], jnp.float32))
    n = 200
    X, cur = scene(rng, n, T_true)
    cur_np = np.asarray(cur).copy()
    bad = rng.choice(n, 40, replace=False)
    cur_np[bad] += rng.uniform(5, 20, (40, 2))
    ls, le, lc, lv = empty_lines()
    res = fs.solve_pose_only(
        jnp.eye(4, dtype=jnp.float32), X, jnp.asarray(cur_np),
        jnp.ones(n, bool), ls, le, lc, lv, K, use_lines=False,
    )
    E = np.asarray(res.pose @ lie.se3_inv(T_true))
    assert np.linalg.norm(E[:3, 3]) < 5e-3
    inl = np.asarray(res.point_inlier)
    assert not inl[bad].any()


def test_pose_only_with_lines(rng):
    T_true = lie.se3_exp(jnp.array([0.005, -0.01, 0.004, 0.15, 0.05, 0.3], jnp.float32))
    X, cur = scene(rng, 100, T_true)
    m = 30
    s_uv = jnp.asarray(rng.uniform([150, 60], [1092, 315], (m, 2)), jnp.float32)
    ang = rng.uniform(0, np.pi, m)
    ln = rng.uniform(40, 120, m)
    e_uv = s_uv + jnp.asarray(np.stack([np.cos(ang) * ln, np.sin(ang) * ln], 1), jnp.float32)
    zs = jnp.asarray(rng.uniform(4, 25, m), jnp.float32)
    ze = jnp.asarray(rng.uniform(4, 25, m), jnp.float32)
    Xs = geometry.backproject(K, s_uv, zs)
    Xe = geometry.backproject(K, e_uv, ze)
    cs = geometry.project(K, lie.transform_point(T_true, Xs))
    ce = geometry.project(K, lie.transform_point(T_true, Xe))
    coeffs = geometry.infinite_line_image(cs, ce)
    res = fs.solve_pose_only(
        jnp.eye(4, dtype=jnp.float32), X, cur, jnp.ones(100, bool),
        Xs, Xe, coeffs, jnp.ones(m, bool), K,
    )
    E = np.asarray(res.pose @ lie.se3_inv(T_true))
    assert np.linalg.norm(E[:3, 3]) < 1e-3
    assert int(res.line_inlier.sum()) == m


def test_depth_noise_injection(rng):
    z = jnp.asarray(rng.uniform(5, 30, 1000), jnp.float32)
    zn = fs.inject_depth_noise(jax.random.PRNGKey(0), z)
    resid = np.asarray(zn - z)
    sigma = np.asarray(z * z / (725.0 * 0.5) * 0.15)
    # empirical std close to the model sigma
    assert 0.7 < np.std(resid / sigma) < 1.3
