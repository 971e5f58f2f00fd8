"""KITTI dataset mode: disparity-encoded depth (bf/(d/factor)) end-to-end."""

import numpy as np

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.utils import metrics
from sdpl_slam_tpu.utils.config import KITTI

from synthetic import SynthConfig, SynthSequence, synth_settings


def test_kitti_disparity_depth_mode():
    cfg = SynthConfig(n_frames=5, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.choose_data = KITTI
    settings.depth_map_factor = 256.0
    settings.bf = 120.0
    settings.run_local_ba = False
    settings.run_global_ba = False      # keep the test fast
    settings.boundary_shrink_x = 0      # synthetic objects reach the border
    settings.boundary_shrink_y = 0
    sys_ = System(settings, verbose=False)
    from synthetic import _cam_pose, _obj_pose

    for t in range(4):
        f = seq.frame(t)
        # KITTI-format GT rows: [frame, id, B(4), t_camera(3), yaw];
        # ObjPoseParsingKT builds Ry(yaw + pi/2) and is lifted by Twc_gt.
        # Our boxes don't rotate in the world and the camera only yaws,
        # so the camera-frame world yaw is -cam_yaw, and the row yaw must
        # subtract the reference's +pi/2 offset.
        T_cw = np.linalg.inv(_cam_pose(cfg, t).astype(np.float64))
        L_w = _obj_pose(cfg, 0, t).astype(np.float64)
        t_cam = T_cw[:3, :3] @ L_w[:3, 3] + T_cw[:3, 3]
        kitti_rows = [np.array(
            [t, 1, 0, 0, 0, 0, t_cam[0], t_cam[1], t_cam[2],
             -0.012 * t - np.pi / 2],
            np.float32,
        )]
        f = f.__class__(**{**f.__dict__, "obj_rows": kitti_rows})
        # encode metric depth as KITTI-style disparity raw values:
        # preprocess computes depth = bf / (raw / factor)
        with np.errstate(divide="ignore"):
            raw = np.where(
                f.depth > 0,
                settings.depth_map_factor * settings.bf / f.depth,
                0.0,
            ).astype(np.float32)
        sys_.track_rgbd(
            f.gray, raw, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, 4, line_detections=f.lines,
        )
    t_err, r_err = metrics.camera_rpe(
        sys_.map.camera_poses, sys_.map.camera_poses_gt
    )
    assert t_err < 0.02, t_err
    assert r_err < 0.2, r_err
    # the object survives the KITTI parsing path too
    assert any(len(m) > 1 for m in sys_.map.rigid_motions)


def test_traj_canvas_drawn():
    """The TrackRGBD trajectory canvas (reference imTraj,
    Tracking.h:67-69, drawn at Tracking.cc:836-907): passing a BGR
    canvas mutates it in place — red camera squares along the
    trajectory, header band, object circles for live labels."""
    cfg = SynthConfig(n_frames=5, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.choose_data = KITTI
    settings.run_local_ba = False
    settings.run_global_ba = False
    settings.boundary_shrink_x = 0
    settings.boundary_shrink_y = 0
    sys_ = System(settings, verbose=False)
    traj = np.full((1000, 1000, 3), 255, np.uint8)   # example/sdpl_slam.cc:93
    before = traj.copy()
    from synthetic import _cam_pose, _obj_pose

    for t in range(4):
        f = seq.frame(t)
        # KITTI-format GT rows (see test_kitti_disparity_depth_mode)
        T_cw = np.linalg.inv(_cam_pose(cfg, t).astype(np.float64))
        L_w = _obj_pose(cfg, 0, t).astype(np.float64)
        t_cam = T_cw[:3, :3] @ L_w[:3, 3] + T_cw[:3, 3]
        kitti_rows = [np.array(
            [t, 1, 0, 0, 0, 0, t_cam[0], t_cam[1], t_cam[2],
             -0.012 * t - np.pi / 2],
            np.float32,
        )]
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, kitti_rows,
            t * 0.1, 4, line_detections=f.lines, traj=traj,
        )
    assert (traj != before).any(), "canvas untouched"
    # red camera square: pure BGR (255,0,0) pixels must exist
    red = (traj[:, :, 0] == 255) & (traj[:, :, 1] == 0) & (traj[:, :, 2] == 0)
    assert red.any(), "no camera squares drawn"
    # header band is blacked out (rect 10..550 x 30..60, possibly with text)
    assert (traj[35:55, 200:540] == 0).any(), "no header band"


def test_preprocess_depth_modes():
    """Depth conversion per dataset switch (Tracking.cc:195-219): OMD
    divides by DepthMapFactor, KITTI converts disparity bf/(d/factor),
    VirtualKITTI (3) matches neither branch -> values pass through
    unscaled; negatives clamp to 0 in every mode."""
    import numpy as np

    from sdpl_slam_tpu.models import frame as fr
    from sdpl_slam_tpu.models.tracking import _np_preprocess_depth

    raw = np.array([[-1.0, 0.0, 50.0, 200.0]], np.float32)
    factor, bf = 100.0, 387.5744

    for mode, expect in (
        (1, np.array([[0.0, 0.0, 0.5, 2.0]], np.float32)),          # OMD
        (2, np.array([[0.0, 0.0, bf / 0.5, bf / 2.0]], np.float32)),  # KITTI
        (3, np.array([[0.0, 0.0, 50.0, 200.0]], np.float32)),       # VKITTI
    ):
        dev = np.asarray(fr.preprocess_depth(raw, mode, factor, bf))
        host = _np_preprocess_depth(raw, mode, factor, bf)
        np.testing.assert_allclose(dev, expect, rtol=1e-6)
        np.testing.assert_allclose(host, expect, rtol=1e-6)
