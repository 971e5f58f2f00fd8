"""On-chip rotation-RPE bisect (VERDICT r4 item 1).

Runs the exact bench configuration (chained loop, KITTI scale, 0.2 px
flow noise) for N frames and dumps per-frame camera r/t RPE vs GT plus
per-frame feature counts to a JSON file.  Run once with the platform
pinned to cpu and once on the tunneled TPU; diff the two dumps to find
the first frame/stage where they diverge.

    python bisect_onchip.py out_tpu.json              # default backend
    SDPL_PIN_CPU=1 python bisect_onchip.py out_cpu.json
"""
import json
import os
import sys
import time

if os.environ.get("SDPL_PIN_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from synthetic import SynthConfig, SynthSequence, synth_settings  # noqa: E402


def main():
    out_path = sys.argv[1]
    n_frames = int(os.environ.get("SDPL_BISECT_FRAMES", "24"))
    run_lba = bool(int(os.environ.get("SDPL_BISECT_LBA", "0")))

    cfg = SynthConfig(
        n_frames=n_frames + 1, n_objects=2, width=1242, height=375,
        fx=721.5377, fy=721.5377, cx=609.5593, cy=172.854,
        noise_flow=0.2,
    )
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.fx, settings.fy = cfg.fx, cfg.fy
    settings.cx, settings.cy = cfg.cx, cfg.cy
    settings.width, settings.height = cfg.width, cfg.height
    settings.max_track_point_bg = 1200
    settings.max_track_point_obj = 800
    settings.max_static_lines = 400
    settings.max_objects = 8
    settings.th_depth_bg = 40.0
    settings.th_depth_obj = 25.0
    settings.min_object_points = 150
    settings.use_sample_fea = 0
    settings.chained_tracking = True
    settings.run_local_ba = run_lba
    if run_lba:
        settings.window_size, settings.overlap_size = 20, 4

    from sdpl_slam_tpu.models.system import System
    from sdpl_slam_tpu.models import resident as _res

    diag = []
    orig_apply = _res.ResidentDriver._apply_out

    def _spy(self, p, o):
        diag.append({
            "n_pt_inl": int(o["n_point_inliers"]),
            "n_stat": int(np.sum(o["stat_valid"])),
            "n_line": int(np.sum(o["line_valid"])),
            "n_obj": int(np.sum(o["obj_valid"])),
            "lanes": [int(x) for x in np.asarray(o["lane_valid"], int)],
        })
        return orig_apply(self, p, o)

    _res.ResidentDriver._apply_out = _spy

    system = System(settings, verbose=False)
    n = seq.n_frames - 1
    for t in range(n):
        f = seq.frame(t)
        nxt = seq.frame(t + 1) if t + 1 < n else None
        nxt2 = seq.frame(t + 2) if t + 2 < n else None
        t0 = time.perf_counter()
        system.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, n + 1,
            next_image=None if nxt is None else nxt.gray,
            next_image2=None if nxt2 is None else nxt2.gray,
        )
        if t % 10 == 0:
            print("frame %d (%.2fs)" % (t, time.perf_counter() - t0),
                  file=sys.stderr, flush=True)
    system.tracker.flush()

    m = system.map
    poses = [np.asarray(p, np.float64) for p in m.camera_poses]
    gts = [np.asarray(p, np.float64) for p in m.camera_poses_gt]
    rows = []
    for i in range(1, len(poses)):
        T_rel = poses[i] @ np.linalg.inv(poses[i - 1])
        T_rel_gt = gts[i] @ np.linalg.inv(gts[i - 1])
        E = np.linalg.inv(T_rel_gt) @ T_rel
        t_err = float(np.linalg.norm(E[:3, 3]))
        c = np.clip((np.trace(E[:3, :3]) - 1) / 2, -1, 1)
        r_err = float(np.degrees(np.arccos(c)))
        row = {"frame": i, "t_mm": round(t_err * 1e3, 4),
               "r_deg": round(r_err, 5)}
        if i < len(diag):
            row.update(diag[i])
        rows.append(row)
    import jax
    out = {
        "platform": jax.devices()[0].platform,
        "n_frames": n,
        "lba": run_lba,
        "median_t_mm": round(float(np.median([r["t_mm"] for r in rows])), 4),
        "median_r_deg": round(float(np.median([r["r_deg"] for r in rows])), 5),
        "mean_r_deg": round(float(np.mean([r["r_deg"] for r in rows])), 5),
        "frames": rows,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("platform", "median_t_mm", "median_r_deg",
                       "mean_r_deg")}))


if __name__ == "__main__":
    main()
