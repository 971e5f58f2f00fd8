import jax
import jax.numpy as jnp
import numpy as np

from sdpl_slam_tpu.ops import geometry, lie
from sdpl_slam_tpu.solvers import frame_solvers as fs

K = geometry.Intrinsics(
    jnp.float32(721.5377), jnp.float32(721.5377),
    jnp.float32(609.5593), jnp.float32(172.8540),
)
W, H = 1242, 375


def make_scene(rng, n=200, T_lw=None, T_cw=None, depth_range=(3.0, 30.0)):
    """Points seen in the last frame + perfect flow to the current frame."""
    if T_lw is None:
        T_lw = jnp.eye(4, dtype=jnp.float32)           # last pose T_cw (world->cam)
    uv = jnp.asarray(
        rng.uniform([100, 50], [W - 100, H - 50], size=(n, 2)), jnp.float32
    )
    z = jnp.asarray(rng.uniform(*depth_range, size=n), jnp.float32)
    X_l = geometry.backproject(K, uv, z)               # last camera frame
    X_w = lie.transform_point(lie.se3_inv(T_lw), X_l)  # world
    cur = geometry.project(K, lie.transform_point(T_cw, X_w))
    flow = cur - uv
    return uv, z, flow, X_w


def pose_err(T_a, T_b):
    E = np.asarray(T_a @ lie.se3_inv(T_b))
    t_err = np.linalg.norm(E[:3, 3])
    r_err = float(lie.rotation_angle_deg(jnp.asarray(E[:3, :3])))
    return t_err, r_err


def empty_lines(m=8):
    return fs.LineBundle(
        obs=jnp.zeros((m, 4), jnp.float32),
        flow0=jnp.zeros((m, 4), jnp.float32),
        depth=jnp.ones((m, 2), jnp.float32),
        valid=jnp.zeros(m, bool),
    )


def test_recovers_pose_perfect_flow(rng):
    T_true = lie.se3_exp(jnp.array([0.01, -0.02, 0.005, 0.3, 0.05, 0.5], jnp.float32))
    uv, z, flow, _ = make_scene(rng, 300, T_cw=T_true)
    pts = fs.PointBundle(obs=uv, flow0=flow, depth=z, valid=jnp.ones(300, bool))
    res = fs.solve_flow_pose(
        jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
        pts, empty_lines(), K,
        flow_prior_info=0.3, use_lines=False,
    )
    t_err, r_err = pose_err(res.pose, T_true)
    assert t_err < 1e-3, t_err
    assert r_err < 0.01, r_err
    assert int(jnp.sum(res.point_inlier)) == 300


def test_outliers_gated(rng):
    T_true = lie.se3_exp(jnp.array([0.005, 0.01, -0.002, 0.2, -0.1, 0.6], jnp.float32))
    n = 300
    uv, z, flow, _ = make_scene(rng, n, T_cw=T_true)
    # corrupt 20% of flows badly
    bad = np.zeros(n, bool)
    bad[rng.choice(n, 60, replace=False)] = True
    flow_np = np.asarray(flow).copy()
    flow_np[bad] += rng.uniform(8, 30, size=(60, 2)) * rng.choice([-1, 1], size=(60, 2))
    pts = fs.PointBundle(
        obs=uv, flow0=jnp.asarray(flow_np), depth=z, valid=jnp.ones(n, bool)
    )
    res = fs.solve_flow_pose(
        jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
        pts, empty_lines(), K, flow_prior_info=0.3, use_lines=False,
    )
    t_err, r_err = pose_err(res.pose, T_true)
    assert t_err < 0.01, t_err
    assert r_err < 0.05, r_err
    inl = np.asarray(res.point_inlier)
    # all corrupted flows must be flagged outliers
    assert not inl[bad].any()
    # most clean flows survive
    assert inl[~bad].mean() > 0.95


def test_with_lines(rng):
    """Lines + points jointly; perfect measurements; pose recovered and all
    lines inliers."""
    T_true = lie.se3_exp(jnp.array([0.008, -0.01, 0.004, 0.25, 0.02, 0.4], jnp.float32))
    n, m = 150, 40
    uv, z, flow, _ = make_scene(rng, n, T_cw=T_true)
    pts = fs.PointBundle(obs=uv, flow0=flow, depth=z, valid=jnp.ones(n, bool))

    # lines: random 3D segments visible in both frames
    s_uv = jnp.asarray(rng.uniform([150, 60], [W - 150, H - 60], size=(m, 2)), jnp.float32)
    ang = rng.uniform(0, np.pi, size=m)
    length = rng.uniform(30, 120, size=m)
    e_uv = s_uv + jnp.asarray(
        np.stack([np.cos(ang) * length, np.sin(ang) * length], 1), jnp.float32
    )
    zs = jnp.asarray(rng.uniform(4, 25, size=m), jnp.float32)
    ze = jnp.asarray(rng.uniform(4, 25, size=m), jnp.float32)
    Xs = geometry.backproject(K, s_uv, zs)
    Xe = geometry.backproject(K, e_uv, ze)
    cur_s = geometry.project(K, lie.transform_point(T_true, Xs))
    cur_e = geometry.project(K, lie.transform_point(T_true, Xe))
    lines = fs.LineBundle(
        obs=jnp.concatenate([s_uv, e_uv], axis=1),
        flow0=jnp.concatenate([cur_s - s_uv, cur_e - e_uv], axis=1),
        depth=jnp.stack([zs, ze], axis=1),
        valid=jnp.ones(m, bool),
    )
    res = fs.solve_flow_pose(
        jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
        pts, lines, K, flow_prior_info=0.3, line_prior_info=0.3,
    )
    t_err, r_err = pose_err(res.pose, T_true)
    assert t_err < 1e-3, t_err
    assert r_err < 0.01, r_err
    assert int(jnp.sum(res.line_inlier)) == m


def test_vmap_over_objects(rng):
    """The same solver vmaps over a batch of objects (masked)."""
    n_obj, n = 4, 120
    T_true = [
        lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.05, jnp.float32))
        for _ in range(n_obj)
    ]
    obs, flows, depths = [], [], []
    for T in T_true:
        uv, z, flow, _ = make_scene(rng, n, T_cw=T)
        obs.append(uv); flows.append(flow); depths.append(z)
    pts = fs.PointBundle(
        obs=jnp.stack(obs), flow0=jnp.stack(flows), depth=jnp.stack(depths),
        valid=jnp.ones((n_obj, n), bool),
    )
    lines = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (n_obj,) + x.shape), empty_lines()
    )
    solve = jax.vmap(
        lambda p, l: fs.solve_flow_pose(
            jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
            p, l, K, use_lines=False,
        )
    )
    res = solve(pts, lines)
    for i in range(n_obj):
        t_err, r_err = pose_err(res.pose[i], T_true[i])
        assert t_err < 2e-3, (i, t_err)
        assert r_err < 0.05, (i, r_err)


def test_solver_jits_and_invalid_padding(rng):
    """Padding with invalid entries must not affect the solution."""
    T_true = lie.se3_exp(jnp.array([0.0, 0.01, 0.0, 0.1, 0.0, 0.3], jnp.float32))
    uv, z, flow, _ = make_scene(rng, 100, T_cw=T_true)
    pad = 56
    pts = fs.PointBundle(
        obs=jnp.concatenate([uv, jnp.zeros((pad, 2), jnp.float32)]),
        flow0=jnp.concatenate([flow, jnp.full((pad, 2), 1e3, jnp.float32)]),
        depth=jnp.concatenate([z, jnp.zeros(pad, jnp.float32)]),
        valid=jnp.concatenate([jnp.ones(100, bool), jnp.zeros(pad, bool)]),
    )
    solve = jax.jit(
        lambda p, l: fs.solve_flow_pose(
            jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
            p, l, K, use_lines=False,
        )
    )
    res = solve(pts, empty_lines())
    t_err, r_err = pose_err(res.pose, T_true)
    assert t_err < 1e-3
    assert not bool(jnp.any(res.point_inlier[100:]))
    assert np.all(np.isfinite(np.asarray(res.flow)))


def test_outlier_gate_threshold(rng):
    """Gating parity: chi2 = 0.1*||r||^2 > rp_thres=0.04 marks an outlier,
    i.e. residuals above ~0.63 px (Optimizer.cc:6456,6712)."""
    T_true = lie.se3_exp(jnp.array([0.0, 0.0, 0.0, 0.05, 0.0, 0.2], jnp.float32))
    n = 200
    uv, z, flow, _ = make_scene(rng, n, T_cw=T_true)
    flow_np = np.asarray(flow).copy()
    flow_np[0] += [0.0, 10.0]    # gross outlier: residual >> 0.63 px
    flow_np[1] += [0.0, 0.05]    # tiny perturbation: stays inlier
    pts = fs.PointBundle(
        obs=uv, flow0=jnp.asarray(flow_np), depth=z, valid=jnp.ones(n, bool)
    )
    res = fs.solve_flow_pose(
        jnp.eye(4, dtype=jnp.float32), jnp.eye(4, dtype=jnp.float32),
        pts, empty_lines(), K, flow_prior_info=0.3, use_lines=False,
    )
    inl = np.asarray(res.point_inlier)
    assert not inl[0], "10px flow corruption must be gated"
    assert inl[1], "0.05px perturbation must stay inlier"
    assert inl[2:].all()
