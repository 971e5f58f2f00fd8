"""Batch bundle adjustment tests: full + partial BA over the synthetic run."""

import numpy as np
import pytest

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.solvers import ba_builder
from sdpl_slam_tpu.utils import metrics

from synthetic import SynthConfig, SynthSequence, synth_settings


@pytest.fixture(scope="module")
def tracked_map():
    cfg = SynthConfig(n_frames=8, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.run_local_ba = False       # exercise BA explicitly below
    sys = System(settings, verbose=False)
    for t in range(7):
        f = seq.frame(t)
        sys.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, 7, line_detections=f.lines,
        )
    return sys


def test_full_ba_does_not_degrade(tracked_map):
    sys = tracked_map
    m = sys.map
    t0, r0 = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    cost = ba_builder.full_batch_optimization(
        m, sys.tracker.K, sys.settings, use_lines=True
    )
    assert np.isfinite(cost)
    t1, r1 = metrics.camera_rpe(m.camera_poses_rf, m.camera_poses_gt)
    # refined must stay within a small factor of the (already accurate)
    # front-end trajectory
    assert t1 < max(2.5 * t0, 0.01), (t0, t1)
    assert r1 < max(2.5 * r0, 0.05), (r0, r1)
    # object motions refined and finite
    for i in range(len(m.rigid_motions_rf)):
        for T in m.rigid_motions_rf[i]:
            assert np.all(np.isfinite(T))


def test_full_ba_improves_corrupted_trajectory(tracked_map):
    """Corrupt the stored camera poses; BA must pull them back using the
    static structure."""
    sys = tracked_map
    import copy

    m = copy.deepcopy(sys.map)
    rng = np.random.default_rng(3)
    for i in range(2, m.n_frames):
        d = np.eye(4, dtype=np.float32)
        d[:3, 3] = rng.normal(0, 0.05, 3)
        m.camera_poses[i] = (m.camera_poses[i] @ d).astype(np.float32)
    t0, r0 = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    ba_builder.full_batch_optimization(m, sys.tracker.K, sys.settings)
    t1, r1 = metrics.camera_rpe(m.camera_poses_rf, m.camera_poses_gt)
    assert t1 < t0 * 0.8, (t0, t1)


def test_partial_ba_runs_and_writes_back(tracked_map):
    sys = tracked_map
    import copy

    m = copy.deepcopy(sys.map)
    before = [p.copy() for p in m.camera_poses]
    cost = ba_builder.partial_batch_optimization(
        m, sys.tracker.K, window=5, cfg=sys.settings
    )
    assert np.isfinite(cost)
    # first window pose pinned (strong prior), others may move slightly
    f0 = m.n_frames - 5
    np.testing.assert_allclose(
        m.camera_poses[f0], before[f0], atol=1e-3
    )
    t1, r1 = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    assert t1 < 0.02, t1


def test_tracklets_built():
    from sdpl_slam_tpu.models import tracklets as tk

    asso = [
        np.array([-1, -1, -1]),
        np.array([0, 2, -1]),        # f1: feat0<-f0:0, feat1<-f0:2
        np.array([1, -1, 0]),        # f2: feat0<-f1:1, feat2<-f1:0
    ]
    tracks = tk.build_tracklets(asso)
    assert [(0, 0), (1, 0), (2, 2)] in tracks
    assert [(0, 2), (1, 1), (2, 0)] in tracks

    labels = [np.array([0]), np.array([2]), np.array([2])]
    asso_d = [np.array([-1]), np.array([0]), np.array([0])]
    dtr, ids = tk.build_dynamic_tracklets(asso_d, labels)
    assert dtr == [[(0, 0), (1, 0), (2, 0)]]
    assert ids == [2]
