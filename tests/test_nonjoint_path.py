"""The bJoint=false pipeline path (PoseOptimizationNew family)."""

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.utils import metrics

from synthetic import SynthConfig, SynthSequence, synth_settings


def test_nonjoint_camera_path_tracks():
    cfg = SynthConfig(n_frames=5, n_objects=0)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.use_joint_optimization = False
    settings.run_local_ba = False
    sys = System(settings, verbose=False)
    for t in range(4):
        f = seq.frame(t)
        sys.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, 4, line_detections=f.lines,
        )
    t_err, r_err = metrics.camera_rpe(
        sys.map.camera_poses, sys.map.camera_poses_gt
    )
    assert t_err < 0.02, t_err
    assert r_err < 0.2, r_err
