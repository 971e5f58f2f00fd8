"""Mask recovery (UpdateMask) test: dropping the instance mask for a frame
must not lose the object -- the splat-forward recovery keeps it tracked."""

import numpy as np

from sdpl_slam_tpu.models.system import System

from synthetic import SynthConfig, SynthSequence, synth_settings


def test_mask_dropout_recovered():
    cfg = SynthConfig(n_frames=6, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.run_local_ba = False
    sys = System(settings, verbose=False)
    for t in range(5):
        f = seq.frame(t)
        mask = f.mask
        if t == 2:  # segmenter failure: object mask lost for one frame
            mask = np.zeros_like(f.mask)
        sys.track_rgbd(
            f.gray, f.depth, f.flow, mask, f.gt_pose, f.obj_rows,
            t * 0.1, 5, line_detections=f.lines,
        )
    m = sys.map
    # the object must be tracked at frame 2 despite the dropped mask
    frames_with_obj = [len(mo) > 1 for mo in m.rigid_motions]
    assert frames_with_obj[1], "frame 2 lost the object despite recovery"
    assert sum(frames_with_obj) >= 3
