"""Config parsing against the real reference yamls + output subsystems."""

from pathlib import Path

import numpy as np
import pytest

from sdpl_slam_tpu.utils import metrics
from sdpl_slam_tpu.utils.config import KITTI, OMD, load_settings

from synthetic import SynthConfig, SynthSequence, synth_settings

REF = "/root/reference/example"


def test_kitti_yaml_parses():
    s = load_settings(f"{REF}/kitti.yaml")
    assert s.fx == pytest.approx(721.5377)
    assert s.bf == pytest.approx(387.5744)
    assert s.choose_data == KITTI
    assert s.depth_map_factor == 256.0
    assert s.th_depth_bg == 40.0 and s.th_depth_obj == 25.0
    assert s.max_track_point_bg == 1200 and s.max_track_point_obj == 800
    assert s.sf_mg_thres == pytest.approx(0.12)
    assert s.sf_ds_thres == pytest.approx(0.3)
    assert s.window_size == 20 and s.overlap_size == 4
    assert s.use_sample_fea == 0
    assert s.orb_n_features == 2500 and s.orb_n_levels == 8
    assert s.orb_ini_th_fast == 20 and s.orb_min_th_fast == 7


def test_omd_yaml_parses():
    s = load_settings(f"{REF}/omd.yaml")
    assert s.choose_data == OMD
    assert s.width > 0 and s.height > 0


def test_shipped_example_yamls_match_reference():
    """The repo ships its own kitti/omd/tum configs (examples/*.yaml);
    they must parse and agree with the reference's on every mapped key
    (the user-facing entry point of examples/run_sequence.py)."""
    ours = Path(__file__).resolve().parents[1] / "examples"
    import dataclasses

    for name in ("kitti.yaml", "omd.yaml", "tum.yaml"):
        a = load_settings(ours / name)
        b = load_settings(f"{REF}/{name}")
        for f in dataclasses.fields(a):
            va, vb = getattr(a, f.name), getattr(b, f.name)
            assert va == vb, (name, f.name, va, vb)


@pytest.fixture(scope="module")
def run():
    cfg = SynthConfig(n_frames=6, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.run_local_ba = False
    from sdpl_slam_tpu.models.system import System

    sys_ = System(settings, verbose=False)
    for t in range(5):
        f = seq.frame(t)
        sys_.track_rgbd(f.gray, f.depth, f.flow, f.mask, f.gt_pose,
                        f.obj_rows, t * 0.1, 5, line_detections=f.lines)
    return sys_


def test_velocity_error(run):
    est, gt, per = run.velocity_error()
    # synthetic object speed ~0.9 m/frame * 36 = ~32 "km/h" units
    assert gt > 0
    assert abs(est - gt) / gt < 0.1, (est, gt)
    assert 1 in per


def test_object_track_time(run):
    tt = metrics.object_track_time(run.map)
    assert tt.get(1, 0) >= 3


def test_plotting_outputs(tmp_path, run):
    from sdpl_slam_tpu.utils import plotting

    ok = plotting.plot_metric_error(run.map, tmp_path)
    if ok:  # matplotlib present
        assert (tmp_path / "camera_rpe.png").exists()
        assert (tmp_path / "trajectory.png").exists()
        assert (tmp_path / "object_motion_error.png").exists()
    plotting.write_tracklet_histograms(run.map, tmp_path)
    h = np.loadtxt(tmp_path / "track_distribution_static.txt")
    assert h.sum() > 0


def test_offline_evaluator(tmp_path):
    """examples/evaluate.py round-trips the written result files and
    reproduces the in-memory metric values."""
    import subprocess
    import sys as _sys

    from synthetic import SynthConfig, SynthSequence, synth_settings
    from sdpl_slam_tpu.models.system import System
    from sdpl_slam_tpu.utils import metrics

    cfg = SynthConfig(n_frames=6, n_objects=1)
    seq = SynthSequence(cfg)
    s = synth_settings(cfg)
    s.run_local_ba = False
    s.run_global_ba = False
    sys_ = System(s, verbose=False)
    n = seq.n_frames - 1
    for t in range(n):
        f = seq.frame(t)
        sys_.track_rgbd(f.gray, f.depth, f.flow, f.mask, f.gt_pose,
                        f.obj_rows, t * 0.1, n, line_detections=f.lines)
    out = tmp_path / "res"
    sys_.save_results(str(out))

    root = Path(__file__).resolve().parents[1]
    _sys.path.insert(0, str(root / "examples"))
    import evaluate as ev

    ids, est = ev.read_pose_file(out / "initial_stereo_new.txt")
    _, gt = ev.read_pose_file(out / "cam_pose_gt_stereo.txt")
    assert len(est) == len(sys_.map.camera_poses)
    t_file, r_file = metrics.camera_rpe(est, gt)
    t_mem, r_mem = metrics.camera_rpe(
        sys_.map.camera_poses, sys_.map.camera_poses_gt
    )
    # file poses carry 9-decimal quantization; the clamped-trace acos
    # amplifies it near identity rotations
    assert abs(t_file - t_mem) < 1e-6
    assert abs(r_file - r_mem) < 5e-3
    # CLI runs end-to-end
    r = subprocess.run(
        [_sys.executable, str(root / "examples" / "evaluate.py"), str(out)],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    assert "camera initial" in r.stdout
