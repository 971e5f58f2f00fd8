"""End-to-end pipeline tests with the real detectors in the loop.

The reference's default KITTI configuration extracts ORB corners
(UseSampleFeature: 0, /root/reference/example/kitti.yaml:58) and LSD lines
every frame inside the Frame constructor (/root/reference/src/Frame.cc:314,
328).  These tests run the full pipeline in that configuration: nothing is
injected -- FAST corner detection and the line detector run on the rendered
grayscale images, and the selected features must carry tracking to the same
accuracy gates as the injected-detection tests (test_pipeline.py).
"""

import numpy as np
import pytest

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.utils import metrics

from synthetic import SynthConfig, SynthSequence, synth_settings


def run_sequence_detectors(cfg: SynthConfig, n=None):
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.use_sample_fea = 0          # FAST corners, not grid sampling
    sys = System(settings, verbose=False)
    n = n or (seq.n_frames - 1)
    for t in range(n):
        f = seq.frame(t)
        # NO line_detections / point_detections: detectors run in-loop
        sys.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n,
        )
    return sys, seq


@pytest.fixture(scope="module")
def detector_run():
    cfg = SynthConfig(n_frames=6, n_objects=1)
    return run_sequence_detectors(cfg)


def test_detected_features_survive_selection(detector_run):
    sys, _ = detector_run
    m = sys.map
    for i in range(m.n_frames):
        # enough FAST corners must pass the static-selection filters
        # (mask==0, depth in (0, ThDepth], flow!=0 -- Frame.cc:491-515)
        assert m.stat_valid[i].sum() >= 100, (i, int(m.stat_valid[i].sum()))
    # detected lines survive the depth-discontinuity + mask filters
    # (Frame.cc:349-389) on at least the steady-state frames
    assert m.line_valid[1].sum() >= 5, int(m.line_valid[1].sum())


def test_camera_accuracy_with_detectors(detector_run):
    sys, _ = detector_run
    m = sys.map
    t_err, r_err = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    # same gates as the injected-detection clean run (test_pipeline.py:39-41)
    assert t_err < 0.01, t_err
    assert r_err < 0.05, r_err


def test_object_tracked_with_detectors(detector_run):
    sys, _ = detector_run
    m = sys.map
    # object points come from the stride-4 mask grid (Frame.cc:769-809),
    # independent of the corner detector -- the object must still track
    frames_with_obj = sum(1 for mo in m.rigid_motions if len(mo) > 1)
    assert frames_with_obj >= 3, frames_with_obj
    t_obj, r_obj, _ = metrics.object_motion_error(
        m.rigid_motions, m.obj_pose_pre, m.rigid_motions_gt, m.obj_stat,
        m.rm_labels,
    )
    assert t_obj < 0.05, t_obj
    assert r_obj < 0.5, r_obj


def test_noisy_run_with_detectors():
    cfg = SynthConfig(n_frames=5, n_objects=1, noise_flow=0.3)
    sys, _ = run_sequence_detectors(cfg)
    m = sys.map
    t_err, r_err = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    assert t_err < 0.05, t_err
    assert r_err < 0.2, r_err
    assert m.stat_valid[-1].sum() >= 100


def test_prefetch_hint_equivalence():
    """The next_image prefetch hint must not change results: detectors run
    earlier but on the same data."""
    cfg = SynthConfig(n_frames=4, n_objects=1)
    seq = SynthSequence(cfg)

    def run(with_hint):
        settings = synth_settings(cfg)
        settings.use_sample_fea = 0
        sys = System(settings, verbose=False)
        n = seq.n_frames - 1
        for t in range(n):
            f = seq.frame(t)
            nxt = seq.frame(t + 1) if (with_hint and t + 1 < n) else None
            sys.track_rgbd(
                f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
                float(t) * 0.1, n,
                next_image=None if nxt is None else nxt.gray,
            )
        return sys.map

    m0 = run(False)
    m1 = run(True)
    for a, b in zip(m0.camera_poses, m1.camera_poses):
        np.testing.assert_allclose(a, b, atol=1e-5)
