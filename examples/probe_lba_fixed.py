"""Isolate the FIXED per-call cost of the warm fused window solve.

The round-5 window-split instrumentation (SDPL_BA_PERF) showed the
"solve" section extrapolating to ~1.1-1.3 s at ZERO LM iterations on the
tunneled chip, which dwarfs the ~45-85 ms/LM-iteration marginal cost.
This probe separates the candidates:

  - device-side exec (timed with the graph ALREADY device-resident)
  - host->device argument transfer (numpy args vs device_put'ed args)
  - python re-trace per call (run_ba_fused._cache_size growth)
  - dispatch/landing latency (back-to-back warm calls)

    python examples/probe_lba_fixed.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
sys.path.insert(0, str(Path(__file__).parent.parent))

from synthetic import SynthConfig, SynthSequence, synth_settings  # noqa

from sdpl_slam_tpu.models.system import System  # noqa
from sdpl_slam_tpu.solvers import ba_builder, batch_ba as bb  # noqa


def main():
    import jax
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    print("# backend:", plat, file=sys.stderr, flush=True)

    cfg = SynthConfig(
        n_frames=22, n_objects=2, width=1242, height=375,
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
    settings.run_local_ba = False
    settings.chained_tracking = plat != "cpu"
    system = System(settings, verbose=False)
    n = 21
    for t in range(n):
        f = seq.frame(t)
        nxt = seq.frame(t + 1) if t + 1 < n else None
        nxt2 = seq.frame(t + 2) if t + 2 < n else None
        system.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            t * 0.1, n + 1,
            next_image=None if nxt is None else nxt.gray,
            next_image2=None if nxt2 is None else nxt2.gray,
        )
    system.tracker.flush()
    m = system.map

    # production-identical bucketing: ratchet + persisted floors
    store = ba_builder._ratchet_store(m)
    floors = ba_builder.load_persisted_floors(system.tracker.cfg)
    if floors:
        store.update(floors)
        print("# persisted floors loaded:", floors, file=sys.stderr)
    with ba_builder._ratchet(store):
        graph, _ = ba_builder.build_graph(
            m, system.tracker.K, 0, 20, min_track_len=3,
            motion_init_identity=False, prior_info=1e7,
        )
    print("# padded shapes:", {
        k: tuple(np.asarray(getattr(graph, k)).shape)
        for k in ("sp_cam", "dp_pt", "tern_prev", "odo_i",
                  "smo_i", "Xs0", "Xd0")
    }, file=sys.stderr, flush=True)
    w = bb.BAWeights()

    graph_dev = jax.block_until_ready(
        jax.device_put(ba_builder._cast_graph(graph, jnp.float32)))

    def timed(label, fn, reps=4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn()[1])           # compile
        print("%-40s compile+run %7.0f ms"
              % (label, (time.perf_counter() - t0) * 1e3), flush=True)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn()
            jax.block_until_ready(out[1])        # cost scalar only
            ts.append((time.perf_counter() - t0) * 1e3)
        print("%-40s warm %8.1f ms  (reps %s)"
              % (label, float(np.median(ts)),
                 [round(x) for x in ts]), flush=True)
        return float(np.median(ts))

    cache0 = bb.run_ba_fused._cache_size()
    walls = {}
    for mi in (1, 2, 4, 8):
        walls[mi] = timed(
            "dev-args max_iters=%d cg=10" % mi,
            lambda mi=mi: bb.run_ba_fused(
                graph_dev, w, max_iters=mi, cg_iters=10,
                gain_threshold=0.0,
            ),
        )
    print("# jit cache entries: %d -> %d (retrace per call iff growth "
          "> 4)" % (cache0, bb.run_ba_fused._cache_size()), flush=True)

    # marginal + fixed decomposition
    xs = np.array(sorted(walls))
    ys = np.array([walls[int(x)] for x in xs])
    a, b = np.polyfit(xs, ys, 1)
    print("per-iter %.1f ms, FIXED %.1f ms (device-resident args)"
          % (a, b), flush=True)

    # host-numpy args: what production pays without the explicit push
    gh = ba_builder._cast_graph(graph, jnp.float32)
    t0 = time.perf_counter()
    out = bb.run_ba_fused(gh, w, max_iters=8, cg_iters=10,
                          gain_threshold=0.0)
    jax.block_until_ready(out[1])
    print("numpy-args  max_iters=8 cg=10  warm %8.1f ms"
          % ((time.perf_counter() - t0) * 1e3), flush=True)

    # full-state pull (write-back's input)
    t0 = time.perf_counter()
    st = jax.block_until_ready(out[0])
    print("state pull after sync: %.1f ms" % (
        (time.perf_counter() - t0) * 1e3), flush=True)
    del st

    # same solve at the BENCH config's persisted floor shapes (the
    # production windows run at these, not at fresh quarter-pow2)
    import json
    fp = ba_builder._floors_path()
    blob = json.load(open(fp)) if fp is not None and fp.exists() else {}
    prod = None
    for key, raw in blob.items():
        if key.startswith("w20_o4_l1_bg1200_ob800_sl400_1242x375"):
            prod = {
                (int(k) if str(k).lstrip("-").isdigit() else str(k)):
                int(v) for k, v in raw.items()
            }
            break
    if prod:
        print("# production floors:", sorted(
            (str(k), v) for k, v in prod.items()), file=sys.stderr)
        store2 = dict(prod)
        with ba_builder._ratchet(store2):
            graph2, _ = ba_builder.build_graph(
                m, system.tracker.K, 0, 20, min_track_len=3,
                motion_init_identity=False, prior_info=1e7,
            )
        g2 = jax.block_until_ready(
            jax.device_put(ba_builder._cast_graph(graph2, jnp.float32)))
        timed("FLOOR-shapes max_iters=8 cg=10",
              lambda: bb.run_ba_fused(g2, w, max_iters=8, cg_iters=10,
                                      gain_threshold=0.0))


if __name__ == "__main__":
    main()
