"""Chained tracking: the resident core fed by host-pushed SAMPLES.

The device-resident loop (models/resident.py) removes the host round-trip
from the frame-to-frame dependency chain, but needs the dense depth /
flow / mask planes on device -- ~8 MB/frame, which the tunneled-TPU wire
(~43 MB/s, no transfer/compute overlap) cannot carry at target rate.
This mode keeps the SAME device core (grouping, solves, commit, renewal
-- build_core_stage) but replaces every dense-plane lookup with values
the host samples at its *shadow* of the device feature positions:

 * The host holds the lagged pulled state (two steps behind the live
   device state -- the hard LAG=2 generation scheme) plus a short ring of
   preprocessed planes, and rolls the pulled positions forward through
   its own flow planes to approximate the live positions.
 * Sample family A: plane values at the rolled base-state row positions
   (one row per base-state feature).  Family B: plane values at the
   previous frame's candidate correspondence positions (one row per
   candidate).  The device gathers per live row by PROVENANCE carried in
   the state (ResidentState.s_asso/s_cand etc.): kept rows read family
   A at their ancestor row, candidate-born rows read family B.
 * Family C is the current frame's candidate selections (the same
   stat/line/obj/oline tmp tuples the host path builds) -- exact, since
   candidate positions are host-known.
 * Mask recovery (UpdateMask) runs on the HOST over the rolled base
   object rows; the pushed mask samples come from the recovered mask.

Approximations vs the dense resident mode (all bounded and documented):
sample positions lag the optimized-flow position updates by the
(sub-pixel per frame) difference between prior and optimized flow,
accumulated over at most two frames; mask recovery votes use the rolled
base rows (missing features born in the last two frames).  End-to-end
accuracy is gated by tests/test_chained.py against the same synthetic
oracle thresholds as the host path.

Per frame the host issues: one gray push + detector dispatch (for frame
t+1), one bundle push + step dispatch (frame t), and two async pull
requests -- joins land lagged, so no dispatch ever waits on a
device->host transfer.  Measured transport floor for this op pattern on
the tunnel: ~33 ms/frame (BASELINE.md round-3 table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..io import native as _native
from ..ops.geometry import Intrinsics
from . import frame_host as fh
from .resident import (
    ResidentDriver,
    ResidentState,
    StageInputs,
    build_core_stage,
    gt_sem_table,
    state_from_host,
)


# ---------------------------------------------------------------------------
# bundle spec
# ---------------------------------------------------------------------------

def bundle_spec(caps, depth=2):
    """(name, shape) rows of the packed f32 sample bundle, in order.

    Family A (base-state rows) and family B (previous frame's
    candidates) carry raw plane samples; the candidate tmp tuples
    (family C) are the host selections verbatim; olc_ok is the
    host-evaluated static-line filter over object-line candidates (the
    reference renewal quirk).  At pipeline ``depth`` 3 the base lags one
    more generation, so rows born TWO frames ago need their own sample
    family B2 (candidates of frame t-2, positions rolled one flow
    plane forward)."""
    NS, NLS, NO, NLO = caps["NS"], caps["NLS"], caps["NO"], caps["NLO"]
    fams = ("A", "B") if depth < 3 else ("A", "B", "B2")
    rows = []
    for fam in fams:
        rows += [
            (f"{fam}_s", (NS, 5)),      # inb, d, m, fu, fv
            (f"{fam}_l", (NLS, 11)),    # inb_s, inb_e, ds, de, dm, ms, me, f4
            (f"{fam}_o", (NO, 5)),      # inb, d, m, fu, fv
            (f"{fam}_ol", (NLO, 9)),    # inb_s, inb_e, ds, de, ms, f4
        ]
    rows += [
        ("c_s_uv", (NS, 2)), ("c_s_d", (NS,)), ("c_s_f", (NS, 2)),
        ("c_s_c", (NS, 2)), ("c_s_v", (NS,)),
        ("c_l_uv", (NLS, 4)), ("c_l_d", (NLS, 2)), ("c_l_f", (NLS, 4)),
        ("c_l_c", (NLS, 4)), ("c_l_v", (NLS,)),
        ("c_o_uv", (NO, 2)), ("c_o_d", (NO,)), ("c_o_f", (NO, 2)),
        ("c_o_c", (NO, 2)), ("c_o_s", (NO,)), ("c_o_v", (NO,)),
        ("c_ol_uv", (NLO, 4)), ("c_ol_d", (NLO, 2)), ("c_ol_f", (NLO, 4)),
        ("c_ol_c", (NLO, 4)), ("c_ol_s", (NLO,)), ("c_ol_v", (NLO,)),
        ("olc_ok", (NLO,)),
        ("f00", (2,)),                  # flow[0,0] (invalid-row fixups)
    ]
    return rows


def bundle_size(caps, depth=2):
    n = 0
    for _, shape in bundle_spec(caps, depth):
        k = 1
        for s in shape:
            k *= s
        n += k
    return n


def _unpack_bundle(buf, caps, depth=2):
    out = {}
    o = 0
    for name, shape in bundle_spec(caps, depth):
        k = 1
        for s in shape:
            k *= s
        out[name] = buf[o:o + k].reshape(shape)
        o += k
    return out


# ---------------------------------------------------------------------------
# device side: provenance gather + sampled filters
# ---------------------------------------------------------------------------

def _gather_prov(A, B, asso, cand):
    """Per live row: family A at the ancestor row if kept, else family B
    at the candidate row.  Rows with neither (never happens for valid
    rows) read A[0]."""
    a = jnp.clip(asso, 0, A.shape[0] - 1)
    b = jnp.clip(cand, 0, B.shape[0] - 1)
    return jnp.where((asso >= 0)[:, None], A[a], B[b])


def _gather_prov3(A, B1, B2, a2, c1, c2):
    """Depth-3 provenance gather.  Priority: rows born last frame read
    family B1 at their candidate row (c1 >= 0 implies a2 = c2 = -1);
    rows born two frames ago read family B2 at their grandparent
    candidate row; everything older reads family A at its 2-step
    composed ancestor row in the base generation."""
    ia = jnp.clip(a2, 0, A.shape[0] - 1)
    i1 = jnp.clip(c1, 0, B1.shape[0] - 1)
    i2 = jnp.clip(c2, 0, B2.shape[0] - 1)
    old = jnp.where((c2 >= 0)[:, None], B2[i2], A[ia])
    return jnp.where((c1 >= 0)[:, None], B1[i1], old)


def identity_prov(caps):
    """Depth-3 side provenance at a rebase point: every live row IS its
    own base-generation row (a2 = identity), nothing is candidate-born
    within the window (c2 = -1)."""
    out = {}
    for fam, cap in (("s", "NS"), ("l", "NLS"), ("o", "NO"),
                     ("ol", "NLO")):
        n = caps[cap]
        out[f"a2_{fam}"] = jnp.arange(n, dtype=jnp.int32)
        out[f"c2_{fam}"] = jnp.full(n, -1, jnp.int32)
    return out


def _compose_prov(state_prev, new_state, caps):
    """Next side provenance: compose this step's 1-deep keep indices
    (new_state.*_asso, referring to rows of ``state_prev``) with
    ``state_prev``'s own 1-deep provenance, yielding 2-deep pointers
    (a2 -> the generation BEFORE state_prev = the depth-3 base at the
    next frame's gather; c2 -> the candidate set of state_prev's birth
    frame)."""
    out = {}
    for fam, cap in (("s", "NS"), ("l", "NLS"), ("o", "NO"),
                     ("ol", "NLO")):
        n = caps[cap]
        k = getattr(new_state, f"{fam}_asso")
        kc = jnp.clip(k, 0, n - 1)
        pa = getattr(state_prev, f"{fam}_asso")
        pc = getattr(state_prev, f"{fam}_cand")
        out[f"a2_{fam}"] = jnp.where(k >= 0, pa[kc], -1)
        out[f"c2_{fam}"] = jnp.where(k >= 0, pc[kc], -1)
    return out


def _bounds_pt(uv, h, w):
    x = uv[..., 0].astype(jnp.int32)
    y = uv[..., 1].astype(jnp.int32)
    return (x > 0) & (x < w - 1) & (y > 0) & (y < h - 1)


class SampledFilts:
    """Filter accessor over host-pushed samples (the chained mode).

    ``sv/lv/ov/olv`` are the provenance-gathered per-row sample tables
    for the live state's stat/line/obj/oline rows; ``b`` is the unpacked
    bundle (candidate tuples read from it directly)."""

    def __init__(self, cfg, caps, hw, b, sv, lv, ov, olv):
        self.cfg, self.caps, self.hw = cfg, caps, hw
        self.b = b
        self.sv, self.lv, self.ov, self.olv = sv, lv, ov, olv

    # ---- state rows ----
    def stat_state(self, uv):
        h, w = self.hw
        inb_s, d, m, fu, fv = [self.sv[:, i] for i in range(5)]
        f = jnp.stack([fu, fv], -1)
        corr = uv + f
        ok = (
            _bounds_pt(uv, h, w) & (inb_s > 0.5)
            & (m == 0) & (d > 0) & (d <= 40.0)
            & (f[:, 0] != 0) & (f[:, 1] != 0)
            & (corr[:, 0] < w) & (corr[:, 0] > 0)
            & (corr[:, 1] < h) & (corr[:, 1] > 0)
        )
        return ok, d, f, corr

    def line_state(self, uv4):
        h, w = self.hw
        lv = self.lv
        inb_s, inb_e, ds, de, dm, ms, me = [lv[:, i] for i in range(7)]
        f4 = lv[:, 7:11]
        corr = uv4 + f4
        ln = jnp.linalg.norm(uv4[:, 2:] - uv4[:, :2], axis=-1)
        disc = jnp.abs(dm - 0.5 * (ds + de)) <= 10.0 * ln / 1000.0
        degen = (jnp.abs(uv4[:, 0] - uv4[:, 2]) < 1e-6) & (
            jnp.abs(uv4[:, 1] - uv4[:, 3]) < 1e-6
        )
        ok = (
            _bounds_pt(uv4[:, :2], h, w) & _bounds_pt(uv4[:, 2:], h, w)
            & (inb_s > 0.5) & (inb_e > 0.5) & ~degen
            & (ms == 0) & (me == 0)
            & (ds > 0) & (ds <= 40.0) & (de > 0) & (de <= 40.0)
            & disc
            & (corr[:, 0] > 0) & (corr[:, 0] < w)
            & (corr[:, 1] > 0) & (corr[:, 1] < h)
            & (corr[:, 2] > 0) & (corr[:, 2] < w)
            & (corr[:, 3] > 0) & (corr[:, 3] < h)
        )
        d2 = jnp.stack([ds, de], axis=1)
        return ok, d2, f4, corr

    def obj_state(self, uv):
        h, w = self.hw
        inb_s, d, m, fu, fv = [self.ov[:, i] for i in range(5)]
        f = jnp.stack([fu, fv], -1)
        corr = uv + f
        mi = m.astype(jnp.int32)
        ok = (
            _bounds_pt(uv, h, w) & (inb_s > 0.5)
            & (mi != 0) & (d > 0) & (d < self.cfg.th_depth_obj)
            & (corr[:, 0] < w) & (corr[:, 0] > 0)
            & (corr[:, 1] < h) & (corr[:, 1] > 0)
        )
        return ok, mi, d, f, corr

    # ---- candidate rows (positions exact; selection guarantees the
    # mask/in-bounds gates at these positions) ----
    def stat_cand(self, uv):
        h, w = self.hw
        b = self.b
        d, f, c = b["c_s_d"], b["c_s_f"], b["c_s_c"]
        ok = (
            (b["c_s_v"] > 0.5)
            & (d > 0) & (d <= 40.0)
            & (f[:, 0] != 0) & (f[:, 1] != 0)
            & (c[:, 0] < w) & (c[:, 0] > 0)
            & (c[:, 1] < h) & (c[:, 1] > 0)
        )
        return ok, d, f, c

    def line_cand(self, uv4):
        h, w = self.hw
        b = self.b
        d2, f4, c4 = b["c_l_d"], b["c_l_f"], b["c_l_c"]
        ok = (
            (b["c_l_v"] > 0.5)
            & (d2[:, 0] > 0) & (d2[:, 0] <= 40.0)
            & (d2[:, 1] > 0) & (d2[:, 1] <= 40.0)
            & (c4[:, 0] > 0) & (c4[:, 0] < w)
            & (c4[:, 1] > 0) & (c4[:, 1] < h)
            & (c4[:, 2] > 0) & (c4[:, 2] < w)
            & (c4[:, 3] > 0) & (c4[:, 3] < h)
        )
        return ok, d2, f4, c4

    def obj_cand(self, uv):
        h, w = self.hw
        b = self.b
        d, f, c = b["c_o_d"], b["c_o_f"], b["c_o_c"]
        m = b["c_o_s"].astype(jnp.int32)
        ok = (
            (b["c_o_v"] > 0.5)
            & (m != 0) & (d > 0) & (d < self.cfg.th_depth_obj)
            & (c[:, 0] < w) & (c[:, 0] > 0)
            & (c[:, 1] < h) & (c[:, 1] > 0)
        )
        return ok, m, d, f, c

    def oline_cand_ok(self, uv4):
        return self.b["olc_ok"] > 0.5

    def flow4(self, uv4):
        # flow at the kept object-line rows: the provenance-gathered f4
        return self.olv[:, 5:9]

    def flow4_final(self, uv4, carried_f4, valid):
        f00 = self.b["f00"]
        fill = jnp.concatenate([f00, f00])[None, :]
        return jnp.where(valid[:, None], carried_f4, fill)


def _inherit_sampled(cfg, state, sv, lv, ov, olv):
    """Sampled mirror of resident.inherit_dev (Tracking.cc:269-473)."""
    th = cfg.th_depth_obj
    s_uv = state.s_c
    s_d = jnp.where((sv[:, 0] > 0.5) & (sv[:, 1] > 0), sv[:, 1], -1.0)

    l_uv = state.l_c
    l_ok = (lv[:, 0] > 0.5) & (lv[:, 1] > 0.5) & (lv[:, 2] > 0) & (lv[:, 3] > 0)
    l_d = jnp.where(l_ok[:, None], lv[:, 2:4], -1.0)

    o_uv = state.o_c
    o_ok = (ov[:, 0] > 0.5) & (ov[:, 1] < th) & (ov[:, 1] > 0)
    o_d = jnp.where(o_ok, ov[:, 1], 0.1)
    o_sem = jnp.where(o_ok, ov[:, 2].astype(jnp.int32), 0)

    ol_uv = state.ol_c
    ol_ok = (
        (olv[:, 0] > 0.5) & (olv[:, 1] > 0.5)
        & (olv[:, 2] > 0) & (olv[:, 2] < th)
        & (olv[:, 3] > 0) & (olv[:, 3] < th)
    )
    ol_d = jnp.where(ol_ok[:, None], olv[:, 2:4], 0.1)
    ol_sem = jnp.where(ol_ok, olv[:, 4].astype(jnp.int32), 0)
    return s_uv, s_d, l_uv, l_d, o_uv, o_d, o_sem, ol_uv, ol_d, ol_sem


def _ltf_sampled(state, lv):
    """Sampled mirror of resident.line_track_filter_dev."""
    uv4 = state.l_c
    ds, de, dm, ms, me = [lv[:, i] for i in (2, 3, 4, 5, 6)]
    length = jnp.linalg.norm(uv4[:, 2:] - uv4[:, :2], axis=-1)
    ok = (
        (jnp.abs(dm - 0.5 * (ds + de)) <= 10.0 * length / 1000.0)
        & (ms == 0) & (me == 0)
    )
    return state.l_valid & ok


def build_chained_step(cfg, K: Intrinsics, caps: dict, hw, depth=2):
    """The chained per-frame jit: unpack bundle -> provenance gathers ->
    sampled inherit/filters -> the shared core stage.

    ``depth`` is the software-pipeline depth (frames in flight + 1).
    At depth 2 (the original scheme) the state's own 1-deep
    asso/cand provenance addresses families A/B directly.  At depth 3
    the base generation lags one more frame, so the step carries a side
    ``prov`` pytree of 2-deep composed pointers (a2/c2 per family) and
    gathers across three families (A/B2/B1)."""
    core = build_core_stage(cfg, K, caps)
    h, w = hw

    def _run_core(state, b, gt_sem_prev, gt_sem_cur, key, sv, lv, ov, olv):
        inh = _inherit_sampled(cfg, state, sv, lv, ov, olv)
        line_ok0 = _ltf_sampled(state, lv)
        si = StageInputs(
            stat_tmp=(b["c_s_uv"], b["c_s_d"], b["c_s_f"], b["c_s_c"],
                      b["c_s_v"] > 0.5),
            line_tmp=(b["c_l_uv"], b["c_l_d"], b["c_l_f"], b["c_l_c"],
                      b["c_l_v"] > 0.5),
            obj_tmp=(b["c_o_uv"], b["c_o_d"], b["c_o_f"], b["c_o_c"],
                     b["c_o_s"].astype(jnp.int32), b["c_o_v"] > 0.5),
            oline_tmp=(b["c_ol_uv"], b["c_ol_d"], b["c_ol_f"], b["c_ol_c"],
                       b["c_ol_s"].astype(jnp.int32), b["c_ol_v"] > 0.5),
            inh=inh, line_ok0=line_ok0,
        )
        filts = SampledFilts(cfg, caps, (h, w), b, sv, lv, ov, olv)
        return core(state, si, filts, (h, w), gt_sem_prev, gt_sem_cur,
                    key, state.last_mask, state.last_flow)

    def step(state: ResidentState, bundle, gt_sem_prev, gt_sem_cur, key):
        b = _unpack_bundle(bundle, caps)
        sv = _gather_prov(b["A_s"], b["B_s"], state.s_asso, state.s_cand)
        lv = _gather_prov(b["A_l"], b["B_l"], state.l_asso, state.l_cand)
        ov = _gather_prov(b["A_o"], b["B_o"], state.o_asso, state.o_cand)
        olv = _gather_prov(
            b["A_ol"], b["B_ol"], state.ol_asso, state.ol_cand
        )
        return _run_core(state, b, gt_sem_prev, gt_sem_cur, key,
                         sv, lv, ov, olv)

    def step3(state: ResidentState, prov, bundle,
              gt_sem_prev, gt_sem_cur, key):
        b = _unpack_bundle(bundle, caps, depth=3)
        sv = _gather_prov3(b["A_s"], b["B_s"], b["B2_s"],
                           prov["a2_s"], state.s_cand, prov["c2_s"])
        lv = _gather_prov3(b["A_l"], b["B_l"], b["B2_l"],
                           prov["a2_l"], state.l_cand, prov["c2_l"])
        ov = _gather_prov3(b["A_o"], b["B_o"], b["B2_o"],
                           prov["a2_o"], state.o_cand, prov["c2_o"])
        olv = _gather_prov3(b["A_ol"], b["B_ol"], b["B2_ol"],
                            prov["a2_ol"], state.ol_cand, prov["c2_ol"])
        new_state, out = _run_core(state, b, gt_sem_prev, gt_sem_cur, key,
                                   sv, lv, ov, olv)
        return new_state, _compose_prov(state, new_state, caps), out

    return step3 if depth >= 3 else step


# ---------------------------------------------------------------------------
# host side: shadow sampling
# ---------------------------------------------------------------------------

def _np_floor_lookup(plane, uv):
    """Host mirror of resident._lookup: floor indices + open-interval
    bounds; returns (values, inb)."""
    h, w = plane.shape[:2]
    u = np.floor(uv[..., 0]).astype(np.int32)
    v = np.floor(uv[..., 1]).astype(np.int32)
    inb = (u > 0) & (u < w - 1) & (v > 0) & (v < h - 1)
    vals = plane[np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)]
    return vals, inb


def _flat_idx(plane_shape, q):
    """Shared floor/clip/flatten index computation for one position set;
    returns (flat_idx, inb).  The per-plane gathers then reuse it (3-7
    planes are sampled at every position set -- recomputing floor/clip
    per plane was ~40% of the per-frame host time)."""
    h, w = plane_shape
    u = np.floor(q[..., 0]).astype(np.int32)
    v = np.floor(q[..., 1]).astype(np.int32)
    inb = (u > 0) & (u < w - 1) & (v > 0) & (v < h - 1)
    np.clip(u, 0, w - 1, out=u)
    np.clip(v, 0, h - 1, out=v)
    return v * w + u, inb


def _sample_point_rows(depth, flow, mask, q):
    """(N,5) family rows [inb, d, m, fu, fv] at positions q."""
    out = _native.sample_point_rows(depth, flow, mask, q)
    if out is not None:
        return out
    idx, inb = _flat_idx(mask.shape, q)
    out = np.empty((len(q), 5), np.float32)
    out[:, 0] = inb
    out[:, 1] = depth.ravel()[idx]
    out[:, 2] = mask.ravel()[idx]
    out[:, 3:5] = flow.reshape(-1, 2)[idx]
    return out


def _sample_line_rows(depth, flow, mask, q4):
    """(N,11) family rows [inb_s, inb_e, ds, de, dm, ms, me, f4]."""
    out = _native.sample_line_rows(depth, flow, mask, q4)
    if out is not None:
        return out
    qs, qe = q4[:, :2], q4[:, 2:]
    i_s, inb_s = _flat_idx(mask.shape, qs)
    i_e, inb_e = _flat_idx(mask.shape, qe)
    i_m, _ = _flat_idx(mask.shape, 0.5 * (qs + qe))
    df = depth.ravel()
    mf = mask.ravel()
    ff = flow.reshape(-1, 2)
    out = np.empty((len(q4), 11), np.float32)
    out[:, 0] = inb_s
    out[:, 1] = inb_e
    out[:, 2] = df[i_s]
    out[:, 3] = df[i_e]
    out[:, 4] = df[i_m]
    out[:, 5] = mf[i_s]
    out[:, 6] = mf[i_e]
    out[:, 7:9] = ff[i_s]
    out[:, 9:11] = ff[i_e]
    return out


def _sample_oline_rows(depth, flow, mask, q4):
    """(N,9) family rows [inb_s, inb_e, ds, de, ms, f4]."""
    out = _native.sample_oline_rows(depth, flow, mask, q4)
    if out is not None:
        return out
    qs, qe = q4[:, :2], q4[:, 2:]
    i_s, inb_s = _flat_idx(mask.shape, qs)
    i_e, inb_e = _flat_idx(mask.shape, qe)
    df = depth.ravel()
    ff = flow.reshape(-1, 2)
    out = np.empty((len(q4), 9), np.float32)
    out[:, 0] = inb_s
    out[:, 1] = inb_e
    out[:, 2] = df[i_s]
    out[:, 3] = df[i_e]
    out[:, 4] = mask.ravel()[i_s]
    out[:, 5:7] = ff[i_s]
    out[:, 7:9] = ff[i_e]
    return out


def _np_filt_line_ok(uv4, depth, flow, mask):
    """Host mirror of resident._filt_line's ok flag (used for the
    object-line candidate gate, the reference renewal quirk)."""
    h, w = mask.shape
    xs = uv4[:, 0].astype(np.int32)
    ys = uv4[:, 1].astype(np.int32)
    xe = uv4[:, 2].astype(np.int32)
    ye = uv4[:, 3].astype(np.int32)
    inb = (
        (xs > 0) & (xs < w - 1) & (ys > 0) & (ys < h - 1)
        & (xe > 0) & (xe < w - 1) & (ye > 0) & (ye < h - 1)
    )
    xsc, ysc = np.clip(xs, 0, w - 1), np.clip(ys, 0, h - 1)
    xec, yec = np.clip(xe, 0, w - 1), np.clip(ye, 0, h - 1)
    ms = mask[ysc, xsc]
    me = mask[yec, xec]
    ds = depth[ysc, xsc]
    de = depth[yec, xec]
    xm = np.clip((xs + xe) // 2, 0, w - 1)
    ym = np.clip((ys + ye) // 2, 0, h - 1)
    dm = depth[ym, xm]
    ln = np.sqrt(((xs - xe) ** 2 + (ys - ye) ** 2).astype(np.float32))
    disc = np.abs(dm - 0.5 * (ds + de)) <= 10.0 * ln / 1000.0
    fs = flow[ysc, xsc]
    fe = flow[yec, xec]
    corr = uv4 + np.concatenate([fs, fe], axis=1)
    degen = (np.abs(uv4[:, 0] - uv4[:, 2]) < 1e-6) & (
        np.abs(uv4[:, 1] - uv4[:, 3]) < 1e-6
    )
    return (
        inb & ~degen & (ms == 0) & (me == 0)
        & (ds > 0) & (ds <= 40.0) & (de > 0) & (de <= 40.0)
        & disc
        & (corr[:, 0] > 0) & (corr[:, 0] < w)
        & (corr[:, 1] > 0) & (corr[:, 1] < h)
        & (corr[:, 2] > 0) & (corr[:, 2] < w)
        & (corr[:, 3] > 0) & (corr[:, 3] < h)
    )


def _rolled_positions(q, flow_p, stride):
    """Positions ``q`` advanced one frame through ``flow_p`` (copy;
    native kernel when available, numpy floor-lookup fallback)."""
    out = np.ascontiguousarray(q, np.float32).copy()
    if _native.roll_positions(flow_p, out, stride):
        return out
    if stride == 2:
        f, _ = _np_floor_lookup(flow_p, out)
        return (out + f).astype(np.float32)
    fs, _ = _np_floor_lookup(flow_p, out[:, :2])
    fe, _ = _np_floor_lookup(flow_p, out[:, 2:])
    return (out + np.concatenate([fs, fe], 1)).astype(np.float32)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

# jitted chained steps shared across identically-configured drivers
_CHAINED_STEP_MEMO: dict = {}


class ChainedDriver(ResidentDriver):
    """Chained-mode driver: resident core + host shadow sampling.

    Generation scheme (hard LAG): before frame t's family-A build the
    host drains step pulls until at most ``depth - 1`` are pending, so
    its base is exactly the state the live device rows' provenance
    refers to (gen t - depth).  depth 2 uses the state's own 1-deep
    asso/cand; depth 3 additionally carries the composed 2-deep side
    provenance (``self.prov``) and a second candidate sample family B2
    (see build_chained_step).  Depth 3 hides one more frame of
    dispatch->result latency behind the pipeline, at the cost of one
    more frame of shadow-roll staleness in the sampled positions and
    mask-recovery votes (accuracy-neutral on the oracle:
    tests/test_chained.py depth-3 gates).  On the tunneled-TPU bench
    rig it does NOT raise throughput -- the stream there is
    byte/exec-saturated at ~43 ms/frame, not latency-bound (measured
    round 5, BASELINE.md); it exists for latency-dominated
    transports."""

    LAG = 1   # max pending AFTER the pre-frame drain (i.e. base = t-2)

    def __init__(self, tracker):
        super().__init__(tracker)
        self.depth = int(getattr(tracker.cfg, "chained_depth", 2) or 2)
        self.depth = max(2, min(3, self.depth))
        self.LAG = self.depth - 1
        self.base = None          # dict: uv/corres/valid/sem per type
        self.base_pos = None      # rolled positions, per type
        self.base_pos_frame = -1  # frame index base_pos lives in
        self.planes = {}          # frame -> (depth_pre, flow, mask_rec)
        self.prev_cands = None    # (stat_tmp, line_tmp, obj_tmp, oline_tmp)
        self.prev_cands2 = None   # the generation before prev_cands
        self.prov = None          # depth-3 composed side provenance
        self._det_pending = {}    # frame -> _FrameDetections (<=2 ahead)
        self._step_fn = None
        self._hw = None

    # -- mode transitions ----------------------------------------------
    def enter(self):
        tr = self.tr
        h, w = tr.last_mask_np.shape
        self._hw = (h, w)
        st = state_from_host(
            tr.last, tr.last_meta, tr.max_id, tr.velocity,
            np.zeros((1, 1), np.int32), np.zeros((1, 1, 2), np.float32),
            tr.MAXO,
        )
        self.state = st
        self._prev_gt = (tr.last.get("gt_objs", []), tr.last["pose_gt"])
        self._last_pose = np.asarray(tr.last["pose"])
        # base = the entered state (identity provenance)
        last = tr.last
        self.base = dict(
            s_uv=last["stat_uv"], s_c=last["stat_corres"],
            l_uv=last["line_uv"], l_c=last["line_corres"],
            o_uv=last["obj_uv"], o_c=last["obj_corres"],
            o_sem=last["obj_sem"], o_valid=last["obj_valid"],
            ol_uv=last["oline_uv"], ol_c=last["oline_corres"],
        )
        self.base_pos = dict(
            s=np.array(last["stat_corres"], np.float32),
            l=np.array(last["line_corres"], np.float32),
            o=np.array(last["obj_corres"], np.float32),
            ol=np.array(last["oline_corres"], np.float32),
        )
        self.base_pos_frame = tr.f_id      # corres live in the NEW frame
        # keep the previous frame's planes for rolling
        self.planes[tr.f_id - 1] = (
            tr.depth_np, tr.last_flow_np, tr.last_mask_np,
        )
        self.prev_cands = None
        self.prev_cands2 = None
        if self.depth >= 3:
            self.prov = identity_prov(self.caps)
        self._det_pending = {}

    def exit(self):
        tr = self.tr
        self.drain_all()
        from .resident import state_to_host

        last, meta, max_id = state_to_host(self.state)
        last["pose_gt"] = self._prev_gt[1]
        last["gt_objs"] = self._prev_gt[0]
        tr.last = last
        tr.last_meta = meta
        tr.max_id = max_id
        tr.velocity = np.asarray(self.state.velocity)
        # host-side planes are authoritative in chained mode
        fr_last = max(self.planes.keys())
        _, flow_l, mask_l = self.planes[fr_last]
        tr.last_mask_np = np.array(mask_l)
        tr.last_flow_np = np.array(flow_l)
        tr.mask_np = tr.last_mask_np.copy()
        self.state = None

    # -- eligibility ----------------------------------------------------
    @staticmethod
    def eligible(cfg):
        return ResidentDriver.eligible(cfg)

    # -- helpers --------------------------------------------------------
    def _rebase_identity(self):
        """After a full drain the host base == the live device state;
        reset device provenance to the identity so family-A gathers stay
        aligned."""
        st = self.state
        caps = self.caps
        self.state = st._replace(
            s_asso=jnp.arange(caps["NS"], dtype=jnp.int32),
            s_cand=jnp.full(caps["NS"], -1, jnp.int32),
            l_asso=jnp.arange(caps["NLS"], dtype=jnp.int32),
            l_cand=jnp.full(caps["NLS"], -1, jnp.int32),
            o_asso=jnp.arange(caps["NO"], dtype=jnp.int32),
            o_cand=jnp.full(caps["NO"], -1, jnp.int32),
            ol_asso=jnp.arange(caps["NLO"], dtype=jnp.int32),
            ol_cand=jnp.full(caps["NLO"], -1, jnp.int32),
        )
        if self.depth >= 3:
            self.prov = identity_prov(caps)

    def _set_base_from_out(self, o, frame):
        """Adopt a drained step output (state content of ``frame``) as the
        new base generation."""
        self.base = dict(
            s_uv=o["stat_uv"], l_uv=o["line_uv"],
            o_uv=o["obj_uv"], o_sem=o["obj_sem"],
            o_valid=o["obj_valid"], ol_uv=o["oline_uv"],
        )
        # corres of the drained state: uv + flow(frame)[uv]
        _, flow_p, _ = self.planes[frame]

        def corres_pt(uv):
            f, _ = _np_floor_lookup(flow_p, uv)
            return (uv + f).astype(np.float32)

        def corres_ln(uv4):
            fs, _ = _np_floor_lookup(flow_p, uv4[:, :2])
            fe, _ = _np_floor_lookup(flow_p, uv4[:, 2:])
            return (uv4 + np.concatenate([fs, fe], 1)).astype(np.float32)

        self.base_pos = dict(
            s=corres_pt(o["stat_uv"]),
            l=corres_ln(o["line_uv"]),
            o=corres_pt(o["obj_uv"]),
            ol=corres_ln(o["oline_uv"]),
        )
        self.base_pos_frame = frame + 1

    def _roll_base_to(self, frame):
        """Advance base_pos through stored flow planes to ``frame``."""
        while self.base_pos_frame < frame:
            k = self.base_pos_frame
            _, flow_p, _ = self.planes[k]
            for key, stride in (("s", 2), ("o", 2), ("l", 4), ("ol", 4)):
                q = np.ascontiguousarray(self.base_pos[key], np.float32)
                if _native.roll_positions(flow_p, q, stride):
                    self.base_pos[key] = q
                elif stride == 2:
                    f, _ = _np_floor_lookup(flow_p, q)
                    self.base_pos[key] = (q + f).astype(np.float32)
                else:
                    fs, _ = _np_floor_lookup(flow_p, q[:, :2])
                    fe, _ = _np_floor_lookup(flow_p, q[:, 2:])
                    self.base_pos[key] = (
                        q + np.concatenate([fs, fe], 1)
                    ).astype(np.float32)
            self.base_pos_frame = k + 1

    def _host_mask_recovery(self, mask, f_id):
        """Host mirror of UpdateMask (Tracking.cc:4730-4810) over the
        rolled base object rows (>= 1-frame-stale ancestry; features born
        since the base generation do not vote -- documented)."""
        prev = self.planes.get(f_id - 1)
        if prev is None:
            return mask
        _, last_flow, last_mask = prev
        h, w = mask.shape
        o_sem = np.asarray(self.base["o_sem"])
        o_valid = np.asarray(self.base["o_valid"]).astype(bool)
        # positions of base obj rows in frame f_id (already rolled)
        q = self.base_pos["o"]
        valid = o_valid & (o_sem > 0)
        u = np.floor(q[:, 0]).astype(np.int32)
        v = np.floor(q[:, 1]).astype(np.int32)
        inb = (u > 0) & (u < w) & (v > 0) & (v < h)
        samples = mask[np.clip(v, 0, h - 1), np.clip(u, 0, w - 1)]
        recover_labels = []
        for lab in np.unique(o_sem[valid]):
            sel = valid & (o_sem == lab) & inb
            if sel.sum() < 100:
                continue
            vals, counts = np.unique(samples[sel], return_counts=True)
            if len(vals) and vals[np.argmax(counts)] == 0:
                recover_labels.append(int(lab))
        if not recover_labels:
            return mask
        rec_pix = np.isin(last_mask, recover_labels)
        ys, xs = np.nonzero(rec_pix)
        fx = last_flow[ys, xs, 0].astype(np.int32)
        fy = last_flow[ys, xs, 1].astype(np.int32)
        nx = xs + fx
        ny = ys + fy
        ok = (nx > 0) & (nx < w) & (ny > 0) & (ny < h)
        # ascending-label overwrite via scatter-max (same as the device
        # update_mask_dev splat)
        splat = np.zeros_like(mask)
        np.maximum.at(splat, (ny[ok], nx[ok]), last_mask[ys[ok], xs[ok]])
        return np.where(splat > 0, splat, mask)

    # -- per-frame ------------------------------------------------------
    def _chained_fn(self):
        if self._step_fn is None:
            # share the jitted step across identically-configured drivers
            from ..utils.config import settings_fingerprint
            memo_key = (settings_fingerprint(self.tr.cfg),
                        repr(sorted(self.caps.items())), self._hw,
                        self.depth)
            fn = _CHAINED_STEP_MEMO.get(memo_key)
            if fn is None:
                step = build_chained_step(
                    self.tr.cfg, self.tr.K, self.caps, self._hw,
                    depth=self.depth,
                )
                fn = _CHAINED_STEP_MEMO[memo_key] = jax.jit(step)
            self._step_fn = fn
        return self._step_fn

    def track(self, gray, depth_raw, flow, mask, pose_gt, gt_objs,
              timing, f_id, n_images, stop_frame,
              line_detections=None, point_detections=None,
              next_gray=None, next_gray2=None):
        import threading
        import time as _time

        tr = self.tr
        cfg = tr.cfg
        from . import tracking as _T

        t_all = _time.perf_counter()
        # per-section wall timers, enabled by SDPL_CHAINED_PERF=1
        # (accumulated in self.perf: section -> [ms, ...])
        import os as _os

        perf = getattr(self, "perf", None)
        if perf is None and _os.environ.get("SDPL_CHAINED_PERF"):
            perf = self.perf = {}
        _last = [t_all]

        def _mark(name):
            if perf is not None:
                now = _time.perf_counter()
                perf.setdefault(name, []).append((now - _last[0]) * 1e3)
                _last[0] = now

        # dispatch upcoming frames' detectors FIRST, up to TWO frames
        # ahead: a detector result lands ~50 ms after dispatch over the
        # tunnel (queue behind the previous step's exec + 40 ms landing),
        # i.e. mid-way into the NEXT frame when dispatched only one ahead
        # -- the selection stage then blocks on the join.  Two-ahead
        # dispatch gives the result a full frame of slack.
        need_fast = cfg.use_sample_fea == 0 and point_detections is None
        need_lines = line_detections is None and cfg.use_lines
        if need_fast or need_lines:
            for fr, g in ((f_id + 1, next_gray), (f_id + 2, next_gray2)):
                if g is not None and fr not in self._det_pending:
                    self._det_pending[fr] = tr._dispatch_detectors(
                        g, need_fast, need_lines
                    )

        # BA trigger for the PREVIOUS frame must complete before this
        # dispatch (the refined pose feeds this frame's solve)
        if self._lba_trigger(f_id - 1):
            self.drain_all()
            self._run_partial_ba()
        else:
            from ..solvers import ba_builder
            ba_builder.maybe_precompile_partial_async(
                tr.map, tr.K, cfg, use_lines=cfg.use_lines,
                stop_frame=stop_frame,
            )

        _mark("dispatch_det")
        # ---- hard-LAG drain: base must be exactly the provenance
        # generation of the live state ----
        while len(self.pending) > self.LAG:
            self._drain_one()
        _mark("drain")

        # ---- host prep: planes ----
        depth_pre = _T._np_preprocess_depth(
            np.asarray(depth_raw, np.float32), cfg.choose_data,
            cfg.depth_map_factor, cfg.bf,
        )
        flow_np = np.ascontiguousarray(flow, dtype=np.float32)
        mask_np = np.asarray(mask, np.int32)
        self._roll_base_to(f_id)
        mask_rec = self._host_mask_recovery(mask_np, f_id)
        self.planes[f_id] = (depth_pre, flow_np, mask_rec)
        for k in list(self.planes.keys()):
            if k < f_id - 3:
                del self.planes[k]
        _mark("planes")

        # ---- families A and B + detector-independent selections (run
        # BEFORE the detector join so the landing overlaps host work) ----
        obj_tmp = _native.select_object_points(
            depth_pre, flow_np, mask_rec, cfg.th_depth_obj, tr.NO,
        )
        if obj_tmp is None:
            obj_tmp = fh.select_object_points(
                depth_pre, flow_np, mask_rec, cfg.th_depth_obj, tr.NO,
            )
        A_s = _sample_point_rows(depth_pre, flow_np, mask_rec,
                                 self.base_pos["s"])
        A_l = _sample_line_rows(depth_pre, flow_np, mask_rec,
                                self.base_pos["l"])
        A_o = _sample_point_rows(depth_pre, flow_np, mask_rec,
                                 self.base_pos["o"])
        A_ol = _sample_oline_rows(depth_pre, flow_np, mask_rec,
                                  self.base_pos["ol"])
        if self.prev_cands is not None:
            pc_s, pc_l, pc_o, pc_ol = self.prev_cands
            B_s = _sample_point_rows(depth_pre, flow_np, mask_rec,
                                     pc_s[3])
            B_l = _sample_line_rows(depth_pre, flow_np, mask_rec,
                                    pc_l[3])
            B_o = _sample_point_rows(depth_pre, flow_np, mask_rec,
                                     pc_o[3])
            B_ol = _sample_oline_rows(depth_pre, flow_np, mask_rec,
                                      pc_ol[3])
        else:
            B_s = np.zeros_like(A_s)
            B_l = np.zeros_like(A_l)
            B_o = np.zeros_like(A_o)
            B_ol = np.zeros_like(A_ol)
        if self.depth >= 3:
            if self.prev_cands2 is not None:
                # candidates of frame t-2: corres live in t-1, roll one
                # flow plane forward to sample this frame's planes
                flow_prev = self.planes[f_id - 1][1]
                p2_s, p2_l, p2_o, p2_ol = self.prev_cands2
                B2_s = _sample_point_rows(
                    depth_pre, flow_np, mask_rec,
                    _rolled_positions(p2_s[3], flow_prev, 2))
                B2_l = _sample_line_rows(
                    depth_pre, flow_np, mask_rec,
                    _rolled_positions(p2_l[3], flow_prev, 4))
                B2_o = _sample_point_rows(
                    depth_pre, flow_np, mask_rec,
                    _rolled_positions(p2_o[3], flow_prev, 2))
                B2_ol = _sample_oline_rows(
                    depth_pre, flow_np, mask_rec,
                    _rolled_positions(p2_ol[3], flow_prev, 4))
            else:
                B2_s = np.zeros_like(A_s)
                B2_l = np.zeros_like(A_l)
                B2_o = np.zeros_like(A_o)
                B2_ol = np.zeros_like(A_ol)
        _mark("families")

        # ---- detector outputs for THIS frame ----
        det = self._det_pending.pop(f_id, None)
        for k in list(self._det_pending.keys()):
            if k <= f_id:
                del self._det_pending[k]
        if det is None and (need_fast or need_lines):
            det = tr._dispatch_detectors(gray, need_fast, need_lines)

        # ---- candidate selections (family C) ----
        tr.depth_np = depth_pre
        tr.mask_np = mask_rec
        stat_tmp, line_tmp, oline_tmp = tr._finish_selection(
            det, point_detections, line_detections, flow_np,
            *self._hw,
        )
        olc_ok = _np_filt_line_ok(
            oline_tmp[0], depth_pre, flow_np, mask_rec
        )
        _mark("selection")

        # ---- pack + dispatch ----
        parts = dict(
            A_s=A_s, A_l=A_l, A_o=A_o, A_ol=A_ol,
            B_s=B_s, B_l=B_l, B_o=B_o, B_ol=B_ol,
            **(dict(B2_s=B2_s, B2_l=B2_l, B2_o=B2_o, B2_ol=B2_ol)
               if self.depth >= 3 else {}),
            c_s_uv=stat_tmp[0], c_s_d=stat_tmp[1], c_s_f=stat_tmp[2],
            c_s_c=stat_tmp[3], c_s_v=stat_tmp[4].astype(np.float32),
            c_l_uv=line_tmp[0], c_l_d=line_tmp[1], c_l_f=line_tmp[2],
            c_l_c=line_tmp[3], c_l_v=line_tmp[4].astype(np.float32),
            c_o_uv=obj_tmp[0], c_o_d=obj_tmp[1], c_o_f=obj_tmp[2],
            c_o_c=obj_tmp[3], c_o_s=obj_tmp[4].astype(np.float32),
            c_o_v=obj_tmp[5].astype(np.float32),
            c_ol_uv=oline_tmp[0], c_ol_d=oline_tmp[1],
            c_ol_f=oline_tmp[2], c_ol_c=oline_tmp[3],
            c_ol_s=oline_tmp[4].astype(np.float32),
            c_ol_v=oline_tmp[5].astype(np.float32),
            olc_ok=olc_ok.astype(np.float32),
            f00=flow_np[0, 0],
        )
        buf = np.concatenate([
            np.ravel(parts[name]).astype(np.float32)
            for name, _ in bundle_spec(self.caps, self.depth)
        ])
        self.prev_cands2 = self.prev_cands
        self.prev_cands = (stat_tmp, line_tmp, obj_tmp, oline_tmp)
        self.last_bundle = buf     # kept for bench.py's device-exec probe
        _mark("families_pack")

        fn = self._chained_fn()
        t0 = _time.perf_counter()
        if self.depth >= 3:
            state, prov, out = fn(
                self.state, self.prov, jnp.asarray(buf),
                gt_sem_table(self._prev_gt[0]), gt_sem_table(gt_objs),
                jax.random.PRNGKey(f_id),
            )
            self.prov = prov
        else:
            state, out = fn(
                self.state, jnp.asarray(buf),
                gt_sem_table(self._prev_gt[0]), gt_sem_table(gt_objs),
                jax.random.PRNGKey(f_id),
            )
        self.state = state
        timing[1] = (_time.perf_counter() - t0) * 1e3
        _mark("dispatch_step")

        out.copy_to_host_async()
        holder = {"np": None, "err": None}

        def _pull(out=out, holder=holder, perf=perf):
            try:
                holder["t0"] = _time.perf_counter()
                if perf is not None:
                    out.block_until_ready()
                    holder["t_exec"] = _time.perf_counter()
                holder["np"] = np.array(out)
                holder["t1"] = _time.perf_counter()
            except Exception as e:
                holder["err"] = e

        th = threading.Thread(target=_pull, daemon=True)
        th.start()
        # slot 0 = host prep (mask recovery, shadow sampling, selections);
        # must be written BEFORE the copy lands in the pending record
        timing[0] = (_time.perf_counter() - t_all) * 1e3 - timing[1]
        self.pending.append(dict(
            f_id=f_id, th=th, holder=holder,
            pose_gt=pose_gt, gt_objs=gt_objs,
            prev_gt=self._prev_gt, timing=timing.copy(),
            stop_frame=stop_frame,
        ))
        self._prev_gt = (gt_objs, pose_gt)

        # the LAST frame finishes synchronously so the final map is exact
        if f_id >= stop_frame or f_id >= n_images - 1:
            self.drain_all()
            run_global = (
                cfg.run_global_ba if cfg.run_global_ba is not None
                else cfg.choose_data == 2
            )
            if f_id == stop_frame and run_global:
                self.exit()
                from ..solvers import ba_builder
                ba_builder.full_batch_optimization(
                    tr.map, tr.K, cfg, use_lines=cfg.use_lines
                )
        return np.asarray(self._last_pose)

    def _drain_one(self):
        p, o = super()._drain_one()
        self._set_base_from_out(o, p["f_id"])
        return p, o

    def drain_all(self):
        while self.pending:
            self._drain_one()
        if self.state is not None:
            # base == the live state now; provenance must be identity
            self._rebase_identity()
