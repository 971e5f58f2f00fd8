"""jax.profiler trace capture around the tracking loop (SURVEY.md section 5,
tracing row: XLA-level traces alongside the 5-slot wall-clock contract)."""

from pathlib import Path

from sdpl_slam_tpu.models.system import System

from synthetic import SynthConfig, SynthSequence, synth_settings


def test_profiler_trace_written(tmp_path):
    cfg = SynthConfig(n_frames=4, n_objects=1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    sys_ = System(settings, verbose=False)
    n = seq.n_frames - 1
    sys_.start_profiler_trace(tmp_path)
    for t in range(n):
        f = seq.frame(t)
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n, line_detections=f.lines,
        )
    sys_.stop_profiler_trace()
    # a plugins/profile/<ts>/ dir with at least one .xplane.pb trace
    traces = list(Path(tmp_path).rglob("*.xplane.pb"))
    assert traces, list(Path(tmp_path).rglob("*"))
