"""Pipelined (1-frame-lag) tracking must be bit-identical to synchronous.

The pipeline only moves WHEN the frame's pull/renew/map work runs (into
the start of the next call); every input it consumes is snapshotted in
the in-flight dict, so the final map must match the synchronous mode
exactly.  Guards the dependency audit of Tracking._track_dispatch /
_track_finish (self.depth_np/mask_np are overwritten by the next frame
before the deferred finish runs).
"""

import dataclasses

import numpy as np

from sdpl_slam_tpu.models.system import System

from synthetic import SynthConfig, SynthSequence, synth_settings


def _run(pipelined: bool, detectors_in_loop: bool):
    cfg = SynthConfig(n_frames=6, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.pipelined_tracking = pipelined
    if detectors_in_loop:
        settings.use_sample_fea = 0
    sys_ = System(settings, verbose=False)
    n = seq.n_frames - 1
    for t in range(n):
        f = seq.frame(t)
        nxt = seq.frame(t + 1) if t + 1 < n else None
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n,
            line_detections=None if detectors_in_loop else f.lines,
            next_image=None if nxt is None else nxt.gray,
        )
    return sys_.map


def _assert_maps_equal(a, b):
    flat = ("camera_poses", "camera_poses_gt", "stat_uv", "stat_3d",
            "stat_valid", "line_uv", "line_valid", "dyn_uv", "dyn_label")
    for name in flat:
        va, vb = getattr(a, name), getattr(b, name)
        assert len(va) == len(vb), name
        for i, (x, y) in enumerate(zip(va, vb)):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{name}[{i}]"
            )
    nested = ("rigid_motions", "rm_labels", "obj_stat", "speeds_gt")
    for name in nested:
        va, vb = getattr(a, name), getattr(b, name)
        assert len(va) == len(vb), name
        for i, (ra, rb) in enumerate(zip(va, vb)):
            assert len(ra) == len(rb), f"{name}[{i}]"
            for j, (x, y) in enumerate(zip(ra, rb)):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"{name}[{i}][{j}]",
                )


def test_pipelined_equals_synchronous_injected():
    m_sync = _run(pipelined=False, detectors_in_loop=False)
    m_pipe = _run(pipelined=True, detectors_in_loop=False)
    _assert_maps_equal(m_sync, m_pipe)


def test_pipelined_equals_synchronous_detectors_in_loop():
    m_sync = _run(pipelined=False, detectors_in_loop=True)
    m_pipe = _run(pipelined=True, detectors_in_loop=True)
    _assert_maps_equal(m_sync, m_pipe)


def test_mid_sequence_map_access_flushes():
    """Reading .map mid-sequence forces the in-flight frame to finish."""
    cfg = SynthConfig(n_frames=5, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.pipelined_tracking = True
    sys_ = System(settings, verbose=False)
    n = seq.n_frames - 1
    for t in range(n):
        f = seq.frame(t)
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n, line_detections=f.lines,
        )
        # the map must always reflect frames 0..t after flush
        assert sys_.map.n_frames == t + 1
