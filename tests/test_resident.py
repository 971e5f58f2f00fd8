"""Parity: the device-resident frame step vs the host-orchestrated path.

The resident step (models/resident.py) re-implements mask recovery,
inheritance, selections, grouping, solves, commit, and renewal in
fixed-shape jnp; these tests drive both implementations over the same
synthetic frames and require the tracked-state dicts to agree --
integer/boolean fields exactly, float fields to f32 tolerance.
"""

import numpy as np
import jax
import pytest

from sdpl_slam_tpu.models.system import System
from sdpl_slam_tpu.models import frame as fr
from sdpl_slam_tpu.models import resident

from synthetic import SynthConfig, SynthSequence, synth_settings

INT_KEYS = [
    "stat_valid", "line_valid", "obj_sem", "obj_label", "obj_valid",
    "oline_sem", "oline_label", "oline_valid",
]
FLOAT_KEYS = [
    "pose", "stat_uv", "stat_depth", "stat_flow", "stat_corres",
    "line_uv", "line_depth", "line_flow", "line_corres",
    "obj_uv", "obj_depth", "obj_flow", "obj_corres",
    "oline_uv", "oline_depth", "oline_flow", "oline_corres",
]


def _run_pair(noise_flow=0.0, n_objects=1, n_frames=5):
    cfg = SynthConfig(n_frames=n_frames, n_objects=n_objects,
                      noise_flow=noise_flow)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.pipelined_tracking = False
    sysH = System(settings, verbose=False)
    tr = sysH.tracker
    n = seq.n_frames - 1
    f0 = seq.frame(0)
    sysH.track_rgbd(f0.gray, f0.depth, f0.flow, f0.mask, f0.gt_pose,
                    f0.obj_rows, 0.0, n, line_detections=f0.lines)

    caps = dict(NS=tr.NS, NLS=tr.NLS, NO=tr.NO, NLO=tr.NLO,
                P=tr.P_OBJ, L=tr.L_OBJ, MAXO=tr.MAXO, GCAP=2 * tr.MAXO)
    step = resident.jit_resident_step(settings, tr.K, caps)
    state = resident.state_from_host(
        tr.last, tr.last_meta, tr.max_id, tr.velocity,
        tr.last_mask_np, tr.last_flow_np, tr.MAXO,
    )
    h, w = cfg.height, cfg.width
    cand = np.asarray(fr.grid_sample_uv(h, w, n_points=tr.N_CAND),
                      np.float32)
    cand_valid = np.ones(tr.N_CAND, bool)

    prev_rows = f0.obj_rows
    for t in range(1, n):
        f = seq.frame(t)
        lcand = np.zeros((tr.NL_CAND, 4), np.float32)
        lv = np.zeros(tr.NL_CAND, bool)
        nl = min(len(f.lines), tr.NL_CAND)
        lcand[:nl] = f.lines[:nl]
        lv[:nl] = True
        key = jax.random.PRNGKey(t)
        state, out = step(
            state, np.asarray(f.depth, np.float32),
            np.ascontiguousarray(f.flow, np.float32),
            np.asarray(f.mask, np.int32),
            cand, cand_valid, lcand, lv,
            resident.gt_sem_table(prev_rows),
            resident.gt_sem_table(f.obj_rows),
            key,
        )
        sysH.track_rgbd(f.gray, f.depth, f.flow, f.mask, f.gt_pose,
                        f.obj_rows, float(t) * 0.1, n,
                        line_detections=f.lines)
        lastD, metaD, max_idD = resident.state_to_host(state)
        yield t, tr, lastD, metaD, max_idD
        prev_rows = f.obj_rows


def _compare(t, tr, lastD, metaD, max_idD):
    lastH = tr.last
    for k in INT_KEYS:
        np.testing.assert_array_equal(
            lastH[k], lastD[k], err_msg=f"frame {t}: {k}"
        )
    for k in FLOAT_KEYS:
        np.testing.assert_allclose(
            lastH[k], lastD[k], atol=5e-3, rtol=1e-4,
            err_msg=f"frame {t}: {k}",
        )
    assert max_idD == tr.max_id, f"frame {t}: max_id"
    assert metaD["sem_position"] == tr.last_meta["sem_position"], t
    assert metaD["mod_label"] == tr.last_meta["mod_label"], t
    assert metaD["obj_stat"] == tr.last_meta["obj_stat"], t


def test_resident_matches_host_clean():
    for t, tr, lastD, metaD, max_idD in _run_pair(noise_flow=0.0):
        _compare(t, tr, lastD, metaD, max_idD)


def test_resident_matches_host_noisy():
    for t, tr, lastD, metaD, max_idD in _run_pair(noise_flow=0.2,
                                                  n_objects=2):
        _compare(t, tr, lastD, metaD, max_idD)


def _run_system(resident: bool, detectors_in_loop: bool, local_ba=False):
    cfg = SynthConfig(n_frames=6, n_objects=2, noise_flow=0.1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.resident_tracking = resident
    settings.run_local_ba = local_ba
    if local_ba:
        settings.window_size = 4
        settings.overlap_size = 2
    if detectors_in_loop:
        settings.use_sample_fea = 0
    sys_ = System(settings, verbose=False)
    n = seq.n_frames - 1
    for t in range(n):
        f = seq.frame(t)
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n,
            line_detections=None if detectors_in_loop else f.lines,
        )
    return sys_.map


def _maps_close(a, b):
    flat_exact = ("stat_valid", "line_valid", "dyn_valid", "dyn_label",
                  "dline_label", "stat_asso")
    flat_float = ("camera_poses", "camera_poses_gt", "stat_uv", "stat_3d",
                  "line_uv", "dyn_uv", "dyn_3d")
    for name in flat_exact:
        va, vb = getattr(a, name), getattr(b, name)
        assert len(va) == len(vb), name
        for i, (x, y) in enumerate(zip(va, vb)):
            np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y), err_msg=f"{name}[{i}]"
            )
    for name in flat_float:
        va, vb = getattr(a, name), getattr(b, name)
        assert len(va) == len(vb), name
        for i, (x, y) in enumerate(zip(va, vb)):
            # rtol covers BA-refined structure at tens of meters: the
            # inexact-Newton CG stops at a residual tolerance, so f32-lsb
            # input differences between the two paths surface as ~5e-4
            # relative write-back differences
            np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), atol=5e-3, rtol=1e-3,
                err_msg=f"{name}[{i}]",
            )
    for name in ("rm_labels", "sm_labels", "obj_stat"):
        assert getattr(a, name) == getattr(b, name), name
    for name in ("rigid_motions", "speeds_gt", "rigid_motions_gt"):
        va, vb = getattr(a, name), getattr(b, name)
        assert len(va) == len(vb), name
        for i, (ra, rb) in enumerate(zip(va, vb)):
            assert len(ra) == len(rb), f"{name}[{i}]"
            for j, (x, y) in enumerate(zip(ra, rb)):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=5e-3, rtol=1e-3,
                    err_msg=f"{name}[{i}][{j}]",
                )


def test_resident_system_matches_host_injected():
    m_host = _run_system(resident=False, detectors_in_loop=False)
    m_res = _run_system(resident=True, detectors_in_loop=False)
    _maps_close(m_host, m_res)


def test_resident_system_matches_host_detectors():
    m_host = _run_system(resident=False, detectors_in_loop=True)
    m_res = _run_system(resident=True, detectors_in_loop=True)
    _maps_close(m_host, m_res)


def test_resident_system_with_local_ba():
    m_host = _run_system(resident=False, detectors_in_loop=False,
                         local_ba=True)
    m_res = _run_system(resident=True, detectors_in_loop=False,
                        local_ba=True)
    # BA runs in both modes at the same trigger frames; refined
    # trajectories must agree
    _maps_close(m_host, m_res)


def test_resident_compressed_input():
    """Input-plane compression (f16 depth/flow + u8 mask, ~3.3 MB/frame
    instead of ~8 MB) must stay within the host-parity tolerances -- the
    ~1e-3 relative quantization sits below the synthetic flow noise."""
    cfg = SynthConfig(n_frames=6, n_objects=2, noise_flow=0.1)
    seq = SynthSequence(cfg)
    settings = synth_settings(cfg)
    settings.resident_tracking = True
    settings.resident_compress_input = True
    settings.run_local_ba = False
    sys_ = System(settings, verbose=False)
    n = seq.n_frames - 1
    for t in range(n):
        f = seq.frame(t)
        sys_.track_rgbd(
            f.gray, f.depth, f.flow, f.mask, f.gt_pose, f.obj_rows,
            float(t) * 0.1, n, line_detections=f.lines,
        )
    m = sys_.map
    from sdpl_slam_tpu.utils import metrics

    t_err, r_err = metrics.camera_rpe(m.camera_poses, m.camera_poses_gt)
    assert t_err < 0.02, t_err
    assert r_err < 0.2, r_err
    # objects still tracked
    assert sum(1 for mm in m.rigid_motions if len(mm) > 1) >= 2
