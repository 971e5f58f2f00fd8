"""End-to-end pipeline tests on the synthetic dynamic sequence."""

import numpy as np
import pytest

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.utils import metrics

from synthetic import SynthConfig, SynthSequence, synth_settings


def run_sequence(cfg: SynthConfig, n=None):
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    sys = System(settings, verbose=False)
    n = n or (seq.n_frames - 1)
    for t in range(n):
        f = seq.frame(t)
        sys.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n,
            line_detections=f.lines,
        )
    return sys, seq


@pytest.fixture(scope="module")
def clean_run():
    cfg = SynthConfig(n_frames=6, n_objects=1)
    return run_sequence(cfg)


def test_camera_trajectory_accuracy(clean_run):
    sys, seq = clean_run
    m = sys.map
    assert m.n_frames == 5
    t_err, r_err = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    # exact flow/depth: sub-centimetre per-frame error expected
    assert t_err < 0.01, t_err
    assert r_err < 0.05, r_err


def test_object_detected_and_motion_accurate(clean_run):
    sys, seq = clean_run
    m = sys.map
    # the moving box must be picked up as a tracked object on most frames
    frames_with_obj = sum(1 for mo in m.rigid_motions if len(mo) > 1)
    assert frames_with_obj >= 3, frames_with_obj
    t_obj, r_obj, per = metrics.object_motion_error(
        m.rigid_motions, m.obj_pose_pre, m.rigid_motions_gt, m.obj_stat,
        m.rm_labels,
    )
    assert t_obj < 0.05, t_obj
    assert r_obj < 0.5, r_obj


def test_static_features_renewed(clean_run):
    sys, seq = clean_run
    m = sys.map
    for i in range(m.n_frames):
        assert m.stat_valid[i].sum() > 100, (i, m.stat_valid[i].sum())
    # lines survive the pipeline
    assert m.line_valid[1].sum() > 5


def test_save_results_formats(tmp_path, clean_run):
    sys, _ = clean_run
    sys.save_results(tmp_path)
    init = np.loadtxt(tmp_path / "initial_stereo_new.txt")
    assert init.shape[1] == 17          # frame id + 16 pose floats
    assert init.shape[0] == sys.map.n_frames
    # bottom row of each pose must be 0 0 0 1
    np.testing.assert_allclose(init[:, 13:], np.tile([0, 0, 0, 1], (len(init), 1)))
    gt = np.loadtxt(tmp_path / "cam_pose_gt_stereo.txt")
    assert gt.shape == init.shape
    mot = np.loadtxt(tmp_path / "obj_mot_stereo_new.txt", ndmin=2)
    if mot.size:
        assert mot.shape[1] == 18       # frame id + label + 16 floats


def test_noisy_run_still_tracks():
    cfg = SynthConfig(n_frames=5, n_objects=1, noise_flow=0.3)
    sys, seq = run_sequence(cfg)
    m = sys.map
    t_err, r_err = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    assert t_err < 0.05, t_err
    assert r_err < 0.2, r_err
