"""Line-segment detection: the LSD / EDLines replacement.

The reference detects lines with LSD (region growing over level-lines) or
EDLines (edge drawing) inside 3rdparty/line_descriptor
(/root/reference/src/Lineextractor.cc:47-135).  Both are inherently
sequential, data-dependent region-growers -- the known-hard kernel for TPU
(SURVEY.md 7.3).  This module uses a block-parallel reformulation:

 1. Sobel gradients -> magnitude + level-line orientation (mod pi).
 2. Edge mask: magnitude threshold + thin non-maximum suppression.
 3. The image is tiled; each tile fits a straight segment to its edge
    pixels by weighted PCA (first/second moments -> principal direction,
    extent = min/max projection).  A tile emits a segment only when it has
    enough edge support and the orientation is coherent (anisotropy test).
 4. Collinear merge rounds: neighbouring tiles' segments that are aligned
    (angle, lateral offset, endpoint gap) are merged into longer segments.
    Each round at most doubles segment length; a few rounds recover long
    structure lines.  All rounds are fixed-shape vectorized ops.

Output format matches the pipeline contract: (L, 4) endpoint arrays
(sx, sy, ex, ey) + validity, like the injected detections consumed by
``Tracking.grab_rgbd``.  LBD descriptors are intentionally not computed:
the reference computes them but matches lines by optical flow, never by
descriptor (SURVEY.md section 2.1 Lineextractor row).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class LineDetectConfig(NamedTuple):
    grad_threshold: float = 30.0     # ~2*5.2 quantization of LSD (q=2)
    tile: int = 16
    min_support: int = 10            # edge pixels per tile
    # scatter anisotropy gate: modest, because the orientation-coherence
    # filter (LSD's 22.5 deg tolerance) is the primary noise rejector and
    # short partial-tile strokes legitimately have lambda1/lambda2 ~ 5
    min_anisotropy: float = 4.0
    merge_rounds: int = 4
    merge_angle_cos: float = 0.985   # ~10 deg
    merge_lateral: float = 2.5       # px
    merge_gap: float = 8.0           # px
    min_length: float = 12.0         # final length gate
    max_lines: int = 512


def _sobel(img: jnp.ndarray):
    img = img.astype(jnp.float32)
    p = jnp.pad(img, 1, mode="edge")
    # 3x3 Sobel
    gx = (
        (p[:-2, 2:] + 2 * p[1:-1, 2:] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[1:-1, :-2] + p[2:, :-2])
    )
    gy = (
        (p[2:, :-2] + 2 * p[2:, 1:-1] + p[2:, 2:])
        - (p[:-2, :-2] + 2 * p[:-2, 1:-1] + p[:-2, 2:])
    )
    return gx, gy


def _thin_edges(mag: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
                threshold: float):
    """Gradient-direction NMS (quantized to 4 directions)."""
    h, w = mag.shape
    p = jnp.pad(mag, 1)
    c = p[1:-1, 1:-1]
    n = {
        "e": p[1:-1, 2:], "w": p[1:-1, :-2],
        "s": p[2:, 1:-1], "n": p[:-2, 1:-1],
        "se": p[2:, 2:], "nw": p[:-2, :-2],
        "ne": p[:-2, 2:], "sw": p[2:, :-2],
    }
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    diag = (ax > 0.4142 * ay) & (ay > 0.4142 * ax)
    same_sign = (gx * gy) > 0
    horiz = (ax >= ay) & ~diag          # gradient mostly x -> compare e/w
    vert = (ay > ax) & ~diag
    keep = jnp.where(
        horiz, (c >= n["e"]) & (c >= n["w"]),
        jnp.where(
            vert, (c >= n["s"]) & (c >= n["n"]),
            jnp.where(
                same_sign,
                (c >= n["se"]) & (c >= n["nw"]),
                (c >= n["ne"]) & (c >= n["sw"]),
            ),
        ),
    )
    return keep & (mag > threshold)


class Segments(NamedTuple):
    uv4: jnp.ndarray      # (N, 4) sx, sy, ex, ey
    length: jnp.ndarray   # (N,)
    valid: jnp.ndarray    # (N,)


def _tile_fit(edge: jnp.ndarray, mag: jnp.ndarray, tile: int,
              min_support: int, min_anisotropy: float,
              gx: jnp.ndarray = None, gy: jnp.ndarray = None,
              angle_tol_deg: float = 22.5):
    """Weighted-PCA segment fit per tile with LSD-style orientation
    coherence: only edge pixels whose level-line angle lies within
    ``angle_tol_deg`` of the tile's dominant orientation contribute (the
    region-growing tolerance of LSD, /root/reference/src/
    Lineextractor.cc:62 ``ang_th 22.5``).  Isolated blobs/corners have
    incoherent orientations and are excluded.  Returns per-tile segment
    grid (gh, gw, 4) + validity."""
    h, w = edge.shape
    gh, gw = h // tile, w // tile
    e = edge[: gh * tile, : gw * tile].astype(jnp.float32)
    m = mag[: gh * tile, : gw * tile] * e

    if gx is not None:
        # doubled-angle unit vectors of the LEVEL LINE (perpendicular to
        # the gradient; doubling makes the pi-periodicity a full period)
        gxc = gx[: gh * tile, : gw * tile]
        gyc = gy[: gh * tile, : gw * tile]
        g2 = gxc * gxc + gyc * gyc + 1e-9
        c2 = (gxc * gxc - gyc * gyc) / g2      # cos(2*theta_grad)
        s2 = (2.0 * gxc * gyc) / g2            # sin(2*theta_grad)

        def tiles0(a):
            return (
                a.reshape(gh, tile, gw, tile).transpose(0, 2, 1, 3)
                .reshape(gh, gw, tile * tile)
            )

        tw = tiles0(m)
        tc2 = tiles0(c2)
        ts2 = tiles0(s2)
        wsum0 = jnp.maximum(jnp.sum(tw, -1), 1e-6)
        mc2 = jnp.sum(tw * tc2, -1) / wsum0
        ms2 = jnp.sum(tw * ts2, -1) / wsum0
        nrm = jnp.sqrt(mc2 * mc2 + ms2 * ms2 + 1e-12)
        mc2, ms2 = mc2 / nrm, ms2 / nrm
        # cos(2(theta - theta_dom)) > cos(2*tol)
        import numpy as _np

        cos_tol = float(_np.cos(_np.radians(2 * angle_tol_deg)))
        coh = (
            tc2 * mc2[..., None] + ts2 * ms2[..., None]
        ) > cos_tol
        # rebuild full-res inlier mask and apply to the weights
        coh_full = (
            coh.reshape(gh, gw, tile, tile).transpose(0, 2, 1, 3)
            .reshape(gh * tile, gw * tile)
        )
        e = e * coh_full
        m = m * coh_full

    ys = jax.lax.broadcasted_iota(jnp.float32, (gh * tile, gw * tile), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (gh * tile, gw * tile), 1)

    def tiles(a):
        return (
            a.reshape(gh, tile, gw, tile).transpose(0, 2, 1, 3)
            .reshape(gh, gw, tile * tile)
        )

    wgt = tiles(m)
    tx = tiles(xs)
    ty = tiles(ys)
    wsum = jnp.sum(wgt, -1)
    wsafe = jnp.maximum(wsum, 1e-6)
    mx = jnp.sum(wgt * tx, -1) / wsafe
    my = jnp.sum(wgt * ty, -1) / wsafe
    dx = tx - mx[..., None]
    dy = ty - my[..., None]
    sxx = jnp.sum(wgt * dx * dx, -1) / wsafe
    syy = jnp.sum(wgt * dy * dy, -1) / wsafe
    sxy = jnp.sum(wgt * dx * dy, -1) / wsafe
    # eigen of [[sxx, sxy], [sxy, syy]]
    tr = sxx + syy
    det = sxx * syy - sxy * sxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc
    l2 = tr / 2 - disc
    # principal direction: eigenvector of lambda1; when sxy ~ 0 the axes
    # are already principal -- pick the larger-variance axis
    off = jnp.abs(sxy) > 1e-9
    vx = jnp.where(off, l1 - syy, jnp.where(sxx >= syy, 1.0, 0.0))
    vy = jnp.where(off, sxy, jnp.where(sxx >= syy, 0.0, 1.0))
    vn = jnp.sqrt(vx * vx + vy * vy + 1e-12)
    vx, vy = vx / vn, vy / vn
    # extent: min/max projection of edge pixels on v
    proj = dx * vx[..., None] + dy * vy[..., None]
    pmax = jnp.max(jnp.where(wgt > 0, proj, -1e9), -1)
    pmin = jnp.min(jnp.where(wgt > 0, proj, 1e9), -1)
    count = jnp.sum(tiles(e), -1)
    aniso = l1 / jnp.maximum(l2, 1e-6)
    ok = (count >= min_support) & (aniso >= min_anisotropy) & (pmax > pmin)
    s = jnp.stack(
        [mx + pmin * vx, my + pmin * vy, mx + pmax * vx, my + pmax * vy],
        axis=-1,
    )
    return s, ok


def _merge_pairs(seg, ok, nbr_seg, nbr_ok, cfg: LineDetectConfig,
                 allow=None):
    """Try to merge each tile's segment with a neighbour's.  Returns merged
    segment + merged flag (applied where both exist and are collinear)."""
    d1 = seg[..., 2:] - seg[..., :2]
    d2 = nbr_seg[..., 2:] - nbr_seg[..., :2]
    l1 = jnp.linalg.norm(d1, axis=-1) + 1e-9
    l2 = jnp.linalg.norm(d2, axis=-1) + 1e-9
    cosang = jnp.abs(jnp.sum(d1 * d2, -1)) / (l1 * l2)
    # lateral offset of neighbour's midpoint from our infinite line
    mid2 = 0.5 * (nbr_seg[..., :2] + nbr_seg[..., 2:])
    n1 = jnp.stack([-d1[..., 1], d1[..., 0]], -1) / l1[..., None]
    lat = jnp.abs(jnp.sum((mid2 - seg[..., :2]) * n1, -1))
    # endpoint gap: smallest distance between endpoints
    gaps = jnp.stack([
        jnp.linalg.norm(seg[..., 2:] - nbr_seg[..., :2], axis=-1),
        jnp.linalg.norm(seg[..., :2] - nbr_seg[..., 2:], axis=-1),
        jnp.linalg.norm(seg[..., 2:] - nbr_seg[..., 2:], axis=-1),
        jnp.linalg.norm(seg[..., :2] - nbr_seg[..., :2], axis=-1),
    ], -1).min(-1)
    can = (
        ok & nbr_ok
        & (cosang > cfg.merge_angle_cos)
        & (lat < cfg.merge_lateral)
        & (gaps < cfg.merge_gap)
    )
    if allow is not None:
        can = can & allow
    # merged endpoints: extreme projections of all 4 endpoints on d1
    pts = jnp.stack(
        [seg[..., :2], seg[..., 2:], nbr_seg[..., :2], nbr_seg[..., 2:]], -2
    )                                              # (..., 4, 2)
    u1 = d1 / l1[..., None]
    t = jnp.sum((pts - seg[..., None, :2]) * u1[..., None, :], -1)
    tmin = jnp.min(t, -1)
    tmax = jnp.max(t, -1)
    new_s = seg[..., :2] + tmin[..., None] * u1
    new_e = seg[..., :2] + tmax[..., None] * u1
    merged = jnp.concatenate([new_s, new_e], -1)
    return jnp.where(can[..., None], merged, seg), can


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_lines(img: jnp.ndarray,
                 cfg: LineDetectConfig = LineDetectConfig()) -> Segments:
    """Detect line segments; returns fixed-cap (max_lines, 4) + validity."""
    gx, gy = _sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    edge = _thin_edges(mag, gx, gy, cfg.grad_threshold)
    seg, ok = _tile_fit(edge, mag, cfg.tile, cfg.min_support,
                        cfg.min_anisotropy, gx=gx, gy=gy)

    # merge rounds over 4 neighbour directions (right, down, down-right,
    # down-left).  Round r looks at stride 2^r (parallel-reduction style:
    # surviving merged segments live in the 'left' tile, so chains double
    # in reach each round).  Consumed neighbours are invalidated.
    gh, gw = ok.shape
    for rnd in range(cfg.merge_rounds):
        stride = 1 << rnd
        for (dy0, dx0) in ((0, 1), (1, 0), (1, 1), (1, -1)):
            dy, dx = dy0 * stride, dx0 * stride
            if abs(dy) >= gh or abs(dx) >= gw:
                continue
            nbr = jnp.roll(seg, (-dy, -dx), axis=(0, 1))
            nbr_ok = jnp.roll(ok, (-dy, -dx), axis=(0, 1))
            # edge tiles must not wrap
            row_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) < gh - dy
            )
            if dx >= 0:
                col_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) < gw - dx
                )
            else:
                col_ok = (
                    jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) >= -dx
                )
            nbr_ok = nbr_ok & row_ok & col_ok
            # parity-disjoint absorbers: a tile may absorb its neighbour
            # only on the even slot of this round's stride, so nothing is
            # simultaneously absorbed and extended (parallel reduction)
            if dx0 != 0:
                idx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
            else:
                idx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
            allow = ((idx // stride) % 2) == 0
            seg, did = _merge_pairs(seg, ok, nbr, nbr_ok, cfg, allow)
            # invalidate consumed neighbours
            consumed = jnp.roll(did, (dy, dx), axis=(0, 1))
            shifted_back_ok = (
                jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0) >= dy
            )
            if dx >= 0:
                shifted_back_ok &= (
                    jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) >= dx
                )
            else:
                shifted_back_ok &= (
                    jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1) < gw + dx
                )
            ok = ok & ~(consumed & shifted_back_ok)

    flat = seg.reshape(-1, 4)
    length = jnp.linalg.norm(flat[:, 2:] - flat[:, :2], axis=-1)
    valid = ok.reshape(-1) & (length >= 0.5 * cfg.min_length)
    # keep the longest max_lines
    score = jnp.where(valid, length, -1.0)
    top = jax.lax.top_k(score, min(cfg.max_lines, score.shape[0]))[1]
    return Segments(
        uv4=flat[top], length=length[top],
        valid=valid[top],
    )


def merge_components_np(uv4, valid,
                        cfg: LineDetectConfig = LineDetectConfig()):
    """Final collinear merge on host: one vectorized all-pairs mergeability
    test (angle / lateral offset / endpoint gap, the same gates as the
    device rounds), connected components over that graph (union-find), and
    per component the extreme endpoint projections onto the longest
    member's direction.  O(K^2) in vectorized numpy (K <= max_lines), a
    few ms -- the previous greedy per-segment loop was Python-quadratic and
    sat on the post-sync critical path of every frame.

    Returns the merged (L, 4) float32 detections (length-filtered).
    """
    import numpy as np

    segs = np.asarray(uv4)[np.asarray(valid)].astype(np.float64)
    k = len(segs)
    if k == 0:
        return segs.astype(np.float32).reshape(0, 4)
    d = segs[:, 2:] - segs[:, :2]
    ln = np.linalg.norm(d, axis=1) + 1e-9
    u = d / ln[:, None]
    nrm = np.stack([-u[:, 1], u[:, 0]], axis=1)
    mid = 0.5 * (segs[:, :2] + segs[:, 2:])

    cosang = np.abs(u @ u.T)
    # lateral offset of j's midpoint from i's infinite line
    rel = mid[None, :, :] - segs[:, None, :2]
    lat = np.abs(np.einsum("ijk,ik->ij", rel, nrm))
    # endpoint gap along i's direction
    t0 = np.einsum("jk,ik->ij", segs[:, :2], u) - np.einsum(
        "ik,ik->i", segs[:, :2], u
    )[:, None]
    t1 = np.einsum("jk,ik->ij", segs[:, 2:], u) - np.einsum(
        "ik,ik->i", segs[:, :2], u
    )[:, None]
    tlo = np.minimum(t0, t1)
    thi = np.maximum(t0, t1)
    gap = np.maximum(tlo - ln[:, None], -thi)
    can = (
        (cosang > cfg.merge_angle_cos)
        & ((lat < cfg.merge_lateral) | (lat.T < cfg.merge_lateral))
        & (gap < cfg.merge_gap)
    )
    can = can | can.T
    np.fill_diagonal(can, True)

    # union-find over the sparse mergeable pairs
    parent = np.arange(k)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ii, jj = np.nonzero(np.triu(can, 1))
    for a, b in zip(ii, jj):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = np.array([find(i) for i in range(k)])

    out = []
    for r in np.unique(roots):
        members = np.nonzero(roots == r)[0]
        lead = members[np.argmax(ln[members])]
        pts = np.concatenate([segs[members, :2], segs[members, 2:]], axis=0)
        t = (pts - segs[lead, :2]) @ u[lead]
        lo, hi = t.min(), t.max()
        a = segs[lead, :2] + lo * u[lead]
        b = segs[lead, :2] + hi * u[lead]
        out.append([a[0], a[1], b[0], b[1]])
    out = np.asarray(out, np.float32).reshape(-1, 4)
    length = np.linalg.norm(out[:, 2:] - out[:, :2], axis=1)
    return out[length >= cfg.min_length]


def detect_lines_np(img, cfg: LineDetectConfig = LineDetectConfig()):
    """Device detection + host final merge -> numpy (L, 4) detections, the
    form consumed by Tracking.grab_rgbd."""
    segs = detect_lines(img, cfg)
    return merge_components_np(segs.uv4, segs.valid, cfg)
