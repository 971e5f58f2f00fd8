"""Config parsing against the real reference yamls + output subsystems."""

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
