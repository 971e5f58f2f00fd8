"""GT object-pose parsing parity fixtures (reference-convention rows).

ObjPoseParsingKT (/root/reference/src/Tracking.cc:3134-3241) sets
y = yaw + pi/2, x = z = 0 and composes R = Ry*Rx*Rz, which reduces to
Ry(yaw + pi/2); t = row[6:9] verbatim.  These fixtures pin that convention
plus the hand-computed body-frame GT motion chain the metrics depend on
(Tracking.cc:1289-1342, System.cc:92-99).
"""

import numpy as np

from sdpl_slam_tpu.models.tracking import (
    obj_pose_parsing_kt,
    obj_pose_parsing_ox,
)


def _ry(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)


def test_kt_rotation_is_ry_yaw_plus_half_pi():
    yaw = 0.37
    row = np.array([3, 1, 10, 20, 30, 40, 1.5, -0.2, 8.0, yaw], np.float32)
    pose = obj_pose_parsing_kt(row)
    np.testing.assert_allclose(pose[:3, :3], _ry(yaw + np.pi / 2), atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], [1.5, -0.2, 8.0], atol=1e-6)
    np.testing.assert_allclose(pose[3], [0, 0, 0, 1], atol=0)


def test_kt_zero_yaw_is_quarter_turn():
    # yaw = 0 must NOT give identity rotation: the reference offsets by
    # +pi/2 (Tracking.cc:3147), i.e. R maps +x to -z (camera coords).
    row = np.array([0, 2, 0, 0, 0, 0, 0.0, 0.0, 5.0, 0.0], np.float32)
    R = obj_pose_parsing_kt(row)[:3, :3]
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 0, -1],
                               atol=1e-6)
    np.testing.assert_allclose(R @ np.array([0.0, 0, 1]), [1, 0, 0],
                               atol=1e-6)


def test_kt_body_frame_gt_motion_hand_computed():
    """Full chain: camera-frame rows -> world poses via Twc_gt
    (Tracking.cc:1289-1311) -> world motion H = L_w_c * inv(L_w_p)
    (:1336-1342) -> body-frame motion inv(L_w_p) * H * L_w_p
    (System.cc:92-99), vs a hand-built rigid scenario."""
    # camera moves +1m in z between frames; object yaws 0.1 rad and
    # advances 0.9 m along its own heading.
    Twc_p = np.eye(4)
    Twc_c = np.eye(4)
    Twc_c[2, 3] = 1.0

    yaw_p, yaw_c = 0.20, 0.30
    # ground-truth world poses we want the parser chain to reproduce
    L_w_p = np.eye(4)
    L_w_p[:3, :3] = _ry(yaw_p + np.pi / 2)
    L_w_p[:3, 3] = [2.0, -0.5, 9.0]
    L_w_c = np.eye(4)
    L_w_c[:3, :3] = _ry(yaw_c + np.pi / 2)
    L_w_c[:3, 3] = [2.1, -0.5, 9.9]

    def row_from_world(L_w, Twc, yaw):
        T_cw = np.linalg.inv(Twc)
        t_cam = T_cw[:3, :3] @ L_w[:3, 3] + T_cw[:3, 3]
        # camera yaw is zero here, so the row's yaw equals the world yaw
        return np.array(
            [0, 1, 0, 0, 0, 0, t_cam[0], t_cam[1], t_cam[2], yaw],
            np.float32,
        )

    Lp = Twc_p @ obj_pose_parsing_kt(row_from_world(L_w_p, Twc_p, yaw_p))
    Lc = Twc_c @ obj_pose_parsing_kt(row_from_world(L_w_c, Twc_c, yaw_c))
    np.testing.assert_allclose(Lp, L_w_p, atol=1e-5)
    np.testing.assert_allclose(Lc, L_w_c, atol=1e-5)

    H_world = Lc @ np.linalg.inv(Lp)
    H_body = np.linalg.inv(Lp) @ H_world @ Lp
    # body-frame motion = inv(L_w_p) @ L_w_c: pure object-frame increment
    expect_body = np.linalg.inv(L_w_p) @ L_w_c
    np.testing.assert_allclose(H_body, expect_body, atol=1e-5)
    # rotation increment is Ry(0.1) in the BODY frame
    np.testing.assert_allclose(H_body[:3, :3], _ry(yaw_c - yaw_p), atol=1e-5)


def test_ox_axis_angle_row():
    aa = np.array([0.0, 0.25, 0.0])
    row = np.array([0, 1, 1.0, 2.0, 3.0, aa[0], aa[1], aa[2]], np.float32)
    pose = obj_pose_parsing_ox(row)
    np.testing.assert_allclose(pose[:3, :3], _ry(0.25), atol=1e-6)
    np.testing.assert_allclose(pose[:3, 3], [1.0, 2.0, 3.0], atol=1e-6)
