import numpy as np

from sdpl_slam_tpu.models.map_state import MapState


def test_map_checkpoint_roundtrip(tmp_path, rng):
    m = MapState()
    m.camera_poses.append(np.eye(4, dtype=np.float32))
    m.stat_uv.append(rng.normal(size=(10, 2)).astype(np.float32))
    m.rigid_motions.append([np.eye(4, dtype=np.float32)])
    m.rm_labels.append([0])
    p = tmp_path / "map.ckpt"
    m.save(p)
    m2 = MapState.load(p)
    assert m2.n_frames == 1
    np.testing.assert_array_equal(m2.stat_uv[0], m.stat_uv[0])
    assert m2.rm_labels == [[0]]


def test_system_resume_matches_uninterrupted():
    """Checkpoint mid-sequence, resume in a fresh System: identical
    trajectory to an uninterrupted run (solves are deterministic)."""
    from sdpl_slam_tpu.models.system import System
    from synthetic import SynthConfig, SynthSequence, synth_settings
    import tempfile, os

    cfg = SynthConfig(n_frames=6, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.run_local_ba = False

    def track(sys_, t):
        f = seq.frame(t)
        sys_.track_rgbd(f.gray, f.depth, f.flow, f.mask, f.gt_pose,
                        f.obj_rows, t * 0.1, 5, line_detections=f.lines)

    ref = System(settings, verbose=False)
    for t in range(5):
        track(ref, t)

    a = System(settings, verbose=False)
    for t in range(3):
        track(a, t)
    ckpt = tempfile.mktemp(suffix=".ckpt")
    a.save_checkpoint(ckpt)
    b = System(settings, verbose=False)
    b.load_checkpoint(ckpt)
    for t in range(3, 5):
        track(b, t)
    os.unlink(ckpt)
    assert b.map.n_frames == ref.map.n_frames
    for i in range(ref.map.n_frames):
        np.testing.assert_allclose(
            b.map.camera_poses[i], ref.map.camera_poses[i], atol=1e-5
        )


def test_renewal_caps_enforced():
    """Static/object feature counts never exceed the configured caps."""
    from sdpl_slam_tpu.models.system import System
    from synthetic import SynthConfig, SynthSequence, synth_settings

    cfg = SynthConfig(n_frames=5, n_objects=2)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.run_local_ba = False
    sys_ = System(settings, verbose=False)
    for t in range(4):
        f = seq.frame(t)
        sys_.track_rgbd(f.gray, f.depth, f.flow, f.mask, f.gt_pose,
                        f.obj_rows, t * 0.1, 4, line_detections=f.lines)
    m = sys_.map
    for i in range(m.n_frames):
        assert m.stat_valid[i].sum() <= settings.max_track_point_bg
        assert m.line_valid[i].sum() <= settings.max_static_lines
        # per-object cap
        labels = m.dyn_label[i]
        for lab in np.unique(labels[labels > 0]):
            assert (labels == lab).sum() <= settings.max_track_point_obj
