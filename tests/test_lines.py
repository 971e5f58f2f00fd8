import numpy as np
import jax.numpy as jnp

from sdpl_slam_tpu.ops import lines as ld


def render_lines(segs, h=192, w=320, thickness=1):
    import cv2

    img = np.full((h, w), 40, np.uint8)
    for (sx, sy, ex, ey) in segs:
        cv2.line(img, (int(sx), int(sy)), (int(ex), int(ey)), 210,
                 thickness, cv2.LINE_AA)
    return img


def seg_distance(gt, det):
    """Max endpoint distance to det's infinite line + length coverage."""
    s, e = np.asarray(gt[:2]), np.asarray(gt[2:])
    ds, de = np.asarray(det[:2]), np.asarray(det[2:])
    d = de - ds
    n = np.array([-d[1], d[0]]) / (np.linalg.norm(d) + 1e-9)
    return max(abs((s - ds) @ n), abs((e - ds) @ n))


def test_detects_isolated_segments(rng):
    gt = np.array([
        [40, 30, 160, 30],      # horizontal
        [60, 60, 60, 170],      # vertical
        [120, 80, 250, 160],    # diagonal
        [200, 40, 280, 20],
    ], np.float32)
    img = render_lines(gt)
    det = ld.detect_lines_np(jnp.asarray(img))
    assert len(det) >= 4
    for g in gt:
        glen = np.linalg.norm(g[2:] - g[:2])
        best_cover = 0.0
        aligned = False
        for dt in det:
            if seg_distance(g, dt) < 4.5:
                dlen = np.linalg.norm(dt[2:] - dt[:2])
                # projected overlap of det onto gt
                u = (g[2:] - g[:2]) / glen
                t0 = (dt[:2] - g[:2]) @ u
                t1 = (dt[2:] - g[:2]) @ u
                lo, hi = min(t0, t1), max(t0, t1)
                cover = max(0.0, min(hi, glen) - max(lo, 0.0))
                best_cover = max(best_cover, cover)
                aligned = True
        assert aligned, f"no detection aligned with {g}"
        assert best_cover > 0.45 * glen, (g, best_cover, glen)


def test_no_lines_on_flat_image():
    img = np.full((192, 320), 100, np.uint8)
    segs = ld.detect_lines(jnp.asarray(img))
    assert int(np.asarray(segs.valid).sum()) == 0


def test_merge_produces_long_segments(rng):
    gt = np.array([[20, 96, 300, 96]], np.float32)    # a long line
    img = render_lines(gt)
    det = ld.detect_lines_np(jnp.asarray(img))
    lengths = np.linalg.norm(det[:, 2:] - det[:, :2], axis=1) if len(det) else []
    # after merge rounds, at least one segment much longer than a tile
    assert len(det) > 0 and max(lengths) > 60, lengths


def test_lsd_nfeatures_caps_detections():
    gt = np.array([
        [40, 30, 160, 30],
        [60, 60, 60, 170],
        [120, 80, 250, 160],
        [200, 40, 280, 20],
    ], np.float32)
    img = render_lines(gt)
    cfg = ld.LineDetectConfig(n_features=2)
    det = ld.detect_lines_np(jnp.asarray(img), cfg)
    assert 1 <= len(det) <= 2
    # the survivors are the longest structures (the two ~130px segments)
    lens = np.linalg.norm(det[:, 2:] - det[:, :2], axis=1)
    assert lens.min() > 80.0


def test_lsd_refine_none_still_detects():
    gt = np.array([[40, 30, 160, 30], [60, 60, 60, 170]], np.float32)
    img = render_lines(gt)
    cfg = ld.LineDetectConfig(refine_steps=0)
    det = ld.detect_lines_np(jnp.asarray(img), cfg)
    assert len(det) >= 2
