"""Parity of the native host-prep kernels (native/sdpl_io.cpp) against
their numpy oracles — the chained-mode family samplers, shadow roll, and
the stride-grid object selection (VERDICT r4 weak #3: these moved to C++
to cut stage_ms[0]).  Random planes incl. out-of-bounds and negative
positions exercise the floor/clip/bounds edge cases."""

import numpy as np
import pytest

from sdpl_slam_tpu.io import native
from sdpl_slam_tpu.models import chained as ch
from sdpl_slam_tpu.models import frame_host as fh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)

H, W = 97, 203


@pytest.fixture()
def planes():
    rng = np.random.default_rng(42)
    depth = rng.uniform(-1.0, 50.0, (H, W)).astype(np.float32)
    flow = rng.normal(0, 3.0, (H, W, 2)).astype(np.float32)
    mask = rng.integers(0, 4, (H, W)).astype(np.int32)
    return depth, flow, mask


def _positions(rng, n):
    # includes negatives and beyond-plane positions
    return rng.uniform([-5, -5], [W + 5, H + 5], (n, 2)).astype(np.float32)


def _np_point_rows(depth, flow, mask, q):
    idx, inb = ch._flat_idx(mask.shape, q)
    out = np.empty((len(q), 5), np.float32)
    out[:, 0] = inb
    out[:, 1] = depth.ravel()[idx]
    out[:, 2] = mask.ravel()[idx]
    out[:, 3:5] = flow.reshape(-1, 2)[idx]
    return out


def test_sample_point_rows(planes):
    depth, flow, mask = planes
    rng = np.random.default_rng(0)
    q = _positions(rng, 1200)
    got = native.sample_point_rows(depth, flow, mask, q)
    np.testing.assert_array_equal(got, _np_point_rows(depth, flow, mask, q))


def test_sample_line_rows(planes):
    depth, flow, mask = planes
    rng = np.random.default_rng(1)
    q4 = np.concatenate(
        [_positions(rng, 400), _positions(rng, 400)], axis=1
    )
    got = native.sample_line_rows(depth, flow, mask, q4)
    qs, qe = q4[:, :2], q4[:, 2:]
    i_s, inb_s = ch._flat_idx(mask.shape, qs)
    i_e, inb_e = ch._flat_idx(mask.shape, qe)
    i_m, _ = ch._flat_idx(mask.shape, 0.5 * (qs + qe))
    df, mf, ff = depth.ravel(), mask.ravel(), flow.reshape(-1, 2)
    exp = np.empty((len(q4), 11), np.float32)
    exp[:, 0] = inb_s
    exp[:, 1] = inb_e
    exp[:, 2] = df[i_s]
    exp[:, 3] = df[i_e]
    exp[:, 4] = df[i_m]
    exp[:, 5] = mf[i_s]
    exp[:, 6] = mf[i_e]
    exp[:, 7:9] = ff[i_s]
    exp[:, 9:11] = ff[i_e]
    np.testing.assert_array_equal(got, exp)


def test_sample_oline_rows(planes):
    depth, flow, mask = planes
    rng = np.random.default_rng(2)
    q4 = np.concatenate(
        [_positions(rng, 100), _positions(rng, 100)], axis=1
    )
    got = native.sample_oline_rows(depth, flow, mask, q4)
    qs, qe = q4[:, :2], q4[:, 2:]
    i_s, inb_s = ch._flat_idx(mask.shape, qs)
    i_e, inb_e = ch._flat_idx(mask.shape, qe)
    df, ff = depth.ravel(), flow.reshape(-1, 2)
    exp = np.empty((len(q4), 9), np.float32)
    exp[:, 0] = inb_s
    exp[:, 1] = inb_e
    exp[:, 2] = df[i_s]
    exp[:, 3] = df[i_e]
    exp[:, 4] = mask.ravel()[i_s]
    exp[:, 5:7] = ff[i_s]
    exp[:, 7:9] = ff[i_e]
    np.testing.assert_array_equal(got, exp)


def test_roll_positions(planes):
    _, flow, _ = planes
    rng = np.random.default_rng(3)
    for stride, n in ((2, 1200), (4, 400)):
        q = (np.concatenate([_positions(rng, n)] * (stride // 2), axis=1)
             .astype(np.float32))
        q_native = np.ascontiguousarray(q.copy())
        assert native.roll_positions(flow, q_native, stride)
        if stride == 2:
            f, _ = ch._np_floor_lookup(flow, q)
            exp = q + f
        else:
            fs, _ = ch._np_floor_lookup(flow, q[:, :2])
            fe, _ = ch._np_floor_lookup(flow, q[:, 2:])
            exp = q + np.concatenate([fs, fe], 1)
        np.testing.assert_array_equal(q_native, exp.astype(np.float32))


def test_select_object_points(planes):
    depth, flow, mask = planes
    cap = 800
    got = native.select_object_points(depth, flow, mask, 25.0, cap)
    exp = fh.select_object_points(depth, flow, mask, 25.0, cap)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)


def test_select_object_points_cap_overflow(planes):
    depth, flow, mask = planes
    cap = 10        # far fewer than the kept candidates
    got = native.select_object_points(depth, flow, mask, 25.0, cap)
    exp = fh.select_object_points(depth, flow, mask, 25.0, cap)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)


def _line_cands(rng, n):
    q4 = np.concatenate([_positions(rng, n), _positions(rng, n)], axis=1)
    # some degenerate (identical endpoints) rows
    q4[:: 17, 2:] = q4[:: 17, :2]
    valid = rng.uniform(size=n) > 0.1
    return q4, valid


def test_select_static_points(planes):
    depth, flow, mask = planes
    rng = np.random.default_rng(4)
    cand = _positions(rng, 3000)
    valid = rng.uniform(size=3000) > 0.1
    got = native.select_static_points(cand, valid, depth, flow, mask,
                                      40.0, 1200)
    exp = fh.select_static_points(cand, valid, depth, flow, mask,
                                  40.0, 1200)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)


def test_select_static_lines(planes):
    depth, flow, mask = planes
    rng = np.random.default_rng(5)
    q4, valid = _line_cands(rng, 800)
    got = native.select_static_lines(q4, valid, depth, flow, mask,
                                     40.0, 400)
    exp = fh.select_static_lines(q4, valid, depth, flow, mask,
                                 40.0, 400)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)


def test_select_object_lines(planes):
    depth, flow, mask = planes
    rng = np.random.default_rng(6)
    q4, valid = _line_cands(rng, 800)
    got = native.select_object_lines(q4, valid, depth, flow, mask,
                                     25.0, 100)
    exp = fh.select_object_lines(q4, valid, depth, flow, mask,
                                 25.0, 100)
    for g, e in zip(got, exp):
        np.testing.assert_array_equal(g, e)
