"""Full example-driver path: on-disk sequence in the reference layout ->
dataset loader -> prefetcher -> System -> result files."""

import numpy as np

from sdpl_slam_tpu.io import dataset

from synthetic import SynthConfig, SynthSequence, synth_settings


def export_sequence(seq: SynthSequence, root, n: int):
    """Write a SynthSequence to disk in the reference dataset layout
    (example/sdpl_slam.cc:164-267)."""
    import cv2

    for d in ("image_0", "depth", "semantic", "flow"):
        (root / d).mkdir(parents=True)
    np.savetxt(root / "times.txt", np.arange(n) * 0.1, fmt="%.6f")
    poses, objposes = [], []
    for i in range(n):
        f = seq.frame(i)
        cv2.imwrite(str(root / "image_0" / f"{i:06d}.png"), f.gray)
        # OMD-style depth: depth * factor as 16-bit png (factor 100)
        cv2.imwrite(
            str(root / "depth" / f"{i:06d}.png"),
            (np.clip(f.depth, 0, 300) * 100).astype(np.uint16),
        )
        np.savetxt(root / "semantic" / f"{i:06d}.txt", f.mask, fmt="%d")
        dataset.write_flo(root / "flow" / f"{i:06d}.flo", f.flow)
        poses.append([i] + list(f.gt_pose.astype(np.float64).ravel()))
        for row in f.obj_rows:
            objposes.append(list(row) + [0.0])  # pad to 10 floats
    np.savetxt(root / "pose_gt.txt", np.asarray(poses), fmt="%.9f")
    if objposes:
        np.savetxt(root / "object_pose.txt", np.asarray(objposes),
                   fmt="%.9f")
    return root


def test_run_sequence_end_to_end(tmp_path):
    cfg = SynthConfig(n_frames=5, n_objects=1)
    seq = SynthSequence(cfg)
    root = export_sequence(seq, tmp_path / "seq", 5)

    settings = synth_settings(cfg)
    settings.depth_map_factor = 100.0     # matches the exported png scale
    settings.run_local_ba = False
    # drive through the loader + prefetcher + System (the example driver)
    from sdpl_slam_tpu.io.prefetch import FramePrefetcher
    from sdpl_slam_tpu.models.system import System
    from sdpl_slam_tpu.utils import metrics

    system = System(settings, verbose=False)
    loaded = dataset.load_sequence(root)
    assert loaded.n_frames == 4
    pf = FramePrefetcher(loaded.frame, loaded.n_frames, lookahead=2)
    for i, (gray, depth, flow, mask) in pf:
        system.track_rgbd(
            gray, depth, flow, mask, loaded.gt_pose(i),
            loaded.gt_obj_poses(i), float(loaded.timestamps[i]),
            loaded.n_frames,
            line_detections=seq.frame(i).lines,
        )
    out = tmp_path / "results"
    system.save_results(out)
    assert (out / "initial_stereo_new.txt").exists()
    assert (out / "Metrix_error.txt").exists()
    assert (out / "track_distribution_static.txt").exists()
    # depth quantization (1cm) degrades accuracy vs the exact-GT tests,
    # but tracking must still be solid
    t_err, r_err = metrics.camera_rpe(
        system.map.camera_poses, system.map.camera_poses_gt
    )
    assert t_err < 0.05, t_err
    assert r_err < 0.3, r_err


def test_make_demo_sequence_roundtrip(tmp_path):
    """examples/make_demo_sequence.py writes a loadable sequence in the
    reference on-disk layout (example/sdpl_slam.cc:164-267)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "make_demo_sequence",
        Path(__file__).resolve().parents[1]
        / "examples" / "make_demo_sequence.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    root = tmp_path / "demo"
    rc = mod.main(["make_demo_sequence.py", str(root), "2", "1"])
    assert rc == 0
    assert (root / "settings.yaml").exists()

    loaded = dataset.load_sequence(root)
    assert loaded.n_frames == 2          # n_frames = files - 1 (flow pairs)
    gray, depth, flow, mask = loaded.frame(1)
    assert gray.ndim == 2 and depth.shape == gray.shape
    assert flow.shape == gray.shape + (2,)
    assert mask.shape == gray.shape and mask.max() >= 1   # object present
    assert np.isfinite(depth).all() and depth.max() > 1.0
    # GT files parse: camera 4x4 + at least one object row per frame
    T = loaded.gt_pose(1)
    assert T.shape == (4, 4) and abs(np.linalg.det(T[:3, :3]) - 1) < 1e-3
    assert len(loaded.gt_obj_poses(1)) >= 1

    # the generated settings drive System construction (same yaml keys
    # as the reference, Tracking.cc:54-176)
    from sdpl_slam_tpu.utils.config import load_settings
    st = load_settings(root / "settings.yaml")
    assert st.width == gray.shape[1] and st.height == gray.shape[0]
    assert st.depth_map_factor == 100.0
