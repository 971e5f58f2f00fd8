"""Chained tracking (models/chained.py): the resident core fed by
host-sampled bundles.  Gates the documented approximations (shadow
sample positions, host mask recovery over rolled base rows) against the
synthetic oracle and against the host path."""

import numpy as np
import pytest

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.utils import metrics

from synthetic import SynthConfig, SynthSequence, synth_settings


def _run(seq, settings, n, **kw):
    sys_ = System(settings, verbose=False)
    for t in range(n):
        f = seq.frame(t)
        nxt = seq.frame(t + 1) if t + 1 < n else None
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, n, line_detections=f.lines,
            next_image=None if nxt is None else nxt.gray,
        )
    return sys_


@pytest.fixture(scope="module")
def chained_runs():
    cfg = SynthConfig(n_frames=9, n_objects=1, width=320, height=192,
                      noise_flow=0.15)
    seq = SynthSequence(cfg)
    s = synth_settings(cfg)
    s.run_local_ba = False
    s.run_global_ba = False
    n = 8

    s_host = synth_settings(cfg)
    s_host.run_local_ba = False
    s_host.run_global_ba = False
    host = _run(seq, s_host, n)

    s_ch = synth_settings(cfg)
    s_ch.run_local_ba = False
    s_ch.run_global_ba = False
    s_ch.chained_tracking = True
    chained = _run(seq, s_ch, n)
    return host, chained, n


def test_chained_tracks_accurately(chained_runs):
    _, chained, _ = chained_runs
    t_err, r_err = metrics.camera_rpe(
        chained.map.camera_poses, chained.map.camera_poses_gt
    )
    assert t_err < 0.02, t_err
    assert r_err < 0.2, r_err


def test_chained_close_to_host_path(chained_runs):
    host, chained, n = chained_runs
    # per-frame camera poses agree to sub-centimeter / hundredth-degree:
    # the only differences are the documented sub-pixel shadow-sampling
    # approximations
    for ph, pc in zip(host.map.camera_poses, chained.map.camera_poses):
        dt = np.linalg.norm(ph[:3, 3] - pc[:3, 3])
        dr = np.degrees(np.arccos(np.clip(
            (np.trace(ph[:3, :3].T @ pc[:3, :3]) - 1) / 2, -1, 1)))
        assert dt < 0.02, (dt, dr)
        assert dr < 0.2, (dt, dr)


def test_chained_tracks_object_motion(chained_runs):
    _, chained, _ = chained_runs
    # the moving box must be tracked as a dynamic object with motions
    n_with_obj = sum(1 for m in chained.map.rigid_motions if len(m) > 1)
    assert n_with_obj >= 4, n_with_obj
    m = chained.map
    t_err, r_err, _ = metrics.object_motion_error(
        m.rigid_motions, m.obj_pose_pre, m.rigid_motions_gt,
        m.obj_stat, m.rm_labels,
    )
    assert t_err < 0.05, t_err
    assert r_err < 0.5, r_err


@pytest.fixture(scope="module")
def chained3_run(chained_runs):
    # depth-3 pipeline: one more frame in flight, 2-deep composed
    # provenance + the B2 sample family (models/chained.py)
    cfg = SynthConfig(n_frames=9, n_objects=1, width=320, height=192,
                      noise_flow=0.15)
    seq = SynthSequence(cfg)
    s = synth_settings(cfg)
    s.run_local_ba = False
    s.run_global_ba = False
    s.chained_tracking = True
    s.chained_depth = 3
    return _run(seq, s, 8)


def test_chained_depth3_tracks_accurately(chained3_run):
    t_err, r_err = metrics.camera_rpe(
        chained3_run.map.camera_poses, chained3_run.map.camera_poses_gt
    )
    assert t_err < 0.02, t_err
    assert r_err < 0.2, r_err


def test_chained_depth3_close_to_host_path(chained_runs, chained3_run):
    host, _, _ = chained_runs
    # one extra frame of shadow-roll staleness than depth 2: the same
    # sub-pixel sampling approximation accumulates over 3 frames
    # instead of 2, so the absolute-pose gate gets proportionate
    # headroom (observed max ~0.0204 m on this 0.15 px-noise scene vs
    # depth 2's ~0.02 gate; per-frame RPE is depth-independent --
    # test_chained_depth3_tracks_accurately keeps the same gate)
    for ph, pc in zip(host.map.camera_poses,
                      chained3_run.map.camera_poses):
        dt = np.linalg.norm(ph[:3, 3] - pc[:3, 3])
        dr = np.degrees(np.arccos(np.clip(
            (np.trace(ph[:3, :3].T @ pc[:3, :3]) - 1) / 2, -1, 1)))
        assert dt < 0.03, (dt, dr)
        assert dr < 0.3, (dt, dr)


def test_chained_depth3_tracks_object_motion(chained3_run):
    m = chained3_run.map
    n_with_obj = sum(1 for mm in m.rigid_motions if len(mm) > 1)
    assert n_with_obj >= 4, n_with_obj
    t_err, r_err, _ = metrics.object_motion_error(
        m.rigid_motions, m.obj_pose_pre, m.rigid_motions_gt,
        m.obj_stat, m.rm_labels,
    )
    assert t_err < 0.05, t_err
    assert r_err < 0.5, r_err


def test_chained_checkpointable_state(chained_runs):
    _, chained, _ = chained_runs
    # after the run the tracker host state is authoritative (driver
    # exited at the stop frame) and save_results works
    import tempfile, os

    d = tempfile.mkdtemp()
    chained.save_results(d)
    assert os.path.exists(os.path.join(d, "initial_stereo_new.txt"))
