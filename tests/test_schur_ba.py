"""Dense-Schur window BA: exactness vs the CG path and tridiag algebra."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.solvers import ba_builder, batch_ba as bb, schur_ba

from synthetic import SynthConfig, SynthSequence, synth_settings


def test_tridiag_solve_matches_dense():
    """Batched block-Thomas vs a dense solve on a random block-tridiag
    SPD system with two chains and padding rows."""
    rng = np.random.default_rng(0)
    P, d = 9, 3
    # chains: [0..3], [4..6]; rows 7,8 uncovered (diag only)
    chain = np.full((2, 5), -1, np.int32)
    chain[0, :4] = [0, 1, 2, 3]
    chain[1, :3] = [4, 5, 6]
    Dd = np.zeros((P, d, d))
    Eo = np.zeros((P, d, d))
    for i in range(P):
        a = rng.normal(size=(d, d))
        Dd[i] = a @ a.T + 4 * np.eye(d)
    for i in (0, 1, 2, 4, 5):
        Eo[i] = 0.3 * rng.normal(size=(d, d))
    rhs = rng.normal(size=(P, d, 2))

    out = np.asarray(schur_ba._tridiag_solve(
        jnp.asarray(chain), jnp.asarray(Dd, jnp.float32),
        jnp.asarray(Eo, jnp.float32), jnp.asarray(rhs, jnp.float32),
    ))

    # dense reference per chain
    def dense(ids):
        n = len(ids)
        T = np.zeros((n * d, n * d))
        r = np.zeros((n * d, 2))
        for a_i, vid in enumerate(ids):
            T[a_i * d:(a_i + 1) * d, a_i * d:(a_i + 1) * d] = Dd[vid]
            r[a_i * d:(a_i + 1) * d] = rhs[vid]
            if a_i + 1 < n:
                T[a_i * d:(a_i + 1) * d, (a_i + 1) * d:(a_i + 2) * d] = \
                    Eo[vid]
                T[(a_i + 1) * d:(a_i + 2) * d, a_i * d:(a_i + 1) * d] = \
                    Eo[vid].T
        return np.linalg.solve(T, r).reshape(n, d, 2)

    for ids in ([0, 1, 2, 3], [4, 5, 6]):
        ref = dense(ids)
        np.testing.assert_allclose(out[ids], ref, atol=2e-4)
    for vid in (7, 8):
        np.testing.assert_allclose(
            out[vid], np.linalg.solve(Dd[vid], rhs[vid]), atol=2e-4
        )


def test_chains_from_links():
    ch = schur_ba.chains_from_links(7, np.array([0, 1, 4]), 5)
    rows = [list(r[r >= 0]) for r in ch]
    assert [0, 1, 2] in rows
    assert [3] in rows
    assert [4, 5] in rows
    assert [6] in rows


@pytest.fixture(scope="module")
def window_graph():
    cfg = SynthConfig(n_frames=8, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.run_local_ba = False
    sys_ = System(settings, verbose=False)
    for t in range(7):
        f = seq.frame(t)
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, 7, line_detections=f.lines,
        )
    m = sys_.map
    graph, meta_bld = ba_builder.build_graph(
        m, sys_.tracker.K, 0, m.n_frames,
        motion_init_identity=False, prior_info=1e7, use_lines=True,
    )
    F = m.n_frames
    M = int(graph.mot_T0.shape[0])
    xd_chain = schur_ba.chains_from_links(
        int(graph.Xd0.shape[0]), np.asarray(graph.tern_prev), F,
        valid=np.asarray(graph.tern_valid),
    )
    ld_chain = schur_ba.chains_from_links(
        int(graph.Ld_U0.shape[0]), np.asarray(graph.ltern_prev), F,
        valid=np.asarray(graph.ltern_valid),
    )
    w = ba_builder._weights_from_cfg(settings)
    return graph, w, xd_chain, ld_chain, F, M


def test_schur_step_is_exact(window_graph):
    """The dense-Schur step must be the EXACT damped-Newton solution:
    its true residual (H + lam I) d + g, measured with the matrix-free
    HVP machinery, must be orders of magnitude below the CG step's
    (which stops at its inexact-Newton tolerance), and its post-step
    cost no worse."""
    graph, w, xd_chain, ld_chain, F, M = window_graph
    state = bb.BAState(
        cam_T=graph.cam_T0, mot_T=graph.mot_T0,
        Xs=graph.Xs0, Ls_U=graph.Ls_U0, Ls_w=graph.Ls_w0,
        Xd=graph.Xd0, Ld_U=graph.Ld_U0, Ld_w=graph.Ld_w0,
    )
    lam = jnp.asarray(1e-4, jnp.float32)
    meta = schur_ba.SchurMeta(
        xd_chain=jnp.asarray(xd_chain), ld_chain=jnp.asarray(ld_chain),
        n_frames=F, n_motions=M,
    )
    d_s, cost_s, gd_s = jax.jit(
        lambda g, s, l: schur_ba.dense_schur_step(g, s, w, l, meta)
    )(graph, state, lam)
    d_cg, cost_cg, gd_cg = jax.jit(
        bb.ba_gn_step, static_argnames=("cg_iters", "w")
    )(graph, state, w, lam, cg_iters=120)
    np.testing.assert_allclose(float(cost_s), float(cost_cg), rtol=1e-5)

    lin, prior, _ = bb._linearize(graph, state, w)
    template = bb._zeros_delta(state)
    g, hvp, _ = bb._hvp_and_grad(lin, prior, graph, template)

    def resid(d):
        hv = hvp(d)
        return float(sum(
            jnp.sum((hv[k] + lam * d[k] + g[k]) ** 2) for k in d
        )) ** 0.5

    r_s, r_cg = resid(d_s), resid(d_cg)
    assert r_s < 1e-4, r_s
    assert r_s < 0.05 * max(r_cg, 1e-12), (r_s, r_cg)

    ns = bb._retract(state, d_s)
    ncg = bb._retract(state, d_cg)
    c_s = float(bb._cost_only(graph, ns, w))
    c_cg = float(bb._cost_only(graph, ncg, w))
    assert c_s <= c_cg * 1.01 + 1e-9, (c_s, c_cg)
    assert c_s < float(cost_s), (c_s, float(cost_s))


def test_schur_fused_run_converges(window_graph):
    graph, w, xd_chain, ld_chain, F, M = window_graph
    state, cost, it = schur_ba.run_ba_fused_schur(
        graph, w, jnp.asarray(xd_chain), jnp.asarray(ld_chain), F, M,
        max_iters=8,
    )
    s2, cost2, it2 = bb.run_ba_fused(graph, w, max_iters=8)
    assert np.isfinite(float(cost))
    assert float(cost) <= float(cost2) * 1.05 + 1e-9, (
        float(cost), float(cost2))
    np.testing.assert_allclose(
        np.asarray(state.cam_T), np.asarray(s2.cam_T), atol=5e-3
    )
