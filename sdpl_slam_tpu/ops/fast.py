"""Vectorized FAST corner detection + pyramid + grid distribution.

TPU re-design of the reference's ORB extractor front end
(/root/reference/src/ORBextractor.cc): 8-level image pyramid (scale 1.2),
FAST-9/16 segment test with ini/min thresholds (ComputeKeyPointsOctTree,
:754), and spatially-distributed keypoint retention (DistributeOctTree,
:528).  The per-pixel segment test is evaluated for ALL pixels at once as
16 shifted image planes (VPU elementwise ops); the octree distribution is
replaced by a per-cell top-k on a regular grid -- the same goal (spatially
even coverage capped at nFeatures) with a fixed-shape, sort-based
formulation.  Descriptors are intentionally omitted from the hot path: the
reference computes BRIEF but never matches with it -- correspondence is
optical-flow-driven (SURVEY.md section 2.1 ORBextractor row).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (OpenCV FAST_9_16 order): (du, dv)
_CIRCLE = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)
_ARC = 9  # FAST-9


def _shifted(img: jnp.ndarray, du: int, dv: int) -> jnp.ndarray:
    """img shifted so output[v, u] = img[v+dv, u+du] (zero-padded)."""
    h, w = img.shape
    pad = 3
    p = jnp.pad(img, pad)
    return jax.lax.dynamic_slice(p, (pad + dv, pad + du), (h, w))


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner response for every pixel (0 = not a corner).

    Score: OpenCV-style sum-of-absolute-differences over the qualifying
    contiguous arc family (statistically equivalent ranking).
    """
    img = img.astype(jnp.float32)
    rings = jnp.stack([_shifted(img, du, dv) for du, dv in _CIRCLE])  # (16,H,W)
    diff = rings - img[None]
    bright = diff > threshold
    dark = diff < -threshold

    def contiguous(mask):
        # mask (16,H,W) -> any window of _ARC consecutive (circular) all-True
        m2 = jnp.concatenate([mask, mask[: _ARC - 1]], axis=0).astype(jnp.float32)
        acc = m2[:16]
        for k in range(1, _ARC):
            acc = acc * m2[k : 16 + k]
        return jnp.any(acc > 0, axis=0)

    is_corner = contiguous(bright) | contiguous(dark)
    sad = jnp.sum(
        jnp.maximum(jnp.abs(diff) - threshold, 0.0), axis=0
    )
    return jnp.where(is_corner, sad, 0.0)


def fast_score_map_pallas(img: jnp.ndarray, threshold: float,
                          interpret: bool = False) -> jnp.ndarray:
    """Pallas TPU kernel for the FAST-9/16 corner response.

    The XLA version materializes 16 shifted image planes plus the arc
    reductions (~35 HBM-roundtripping intermediates at image size); this
    kernel keeps the whole frame in VMEM (a 1242x375 f32 KITTI frame is
    1.9 MB << 16 MB) and fuses the ring comparisons, the circular-arc
    test, and the SAD score into one pass on the VPU.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = img.shape
    img_f = img.astype(jnp.float32)
    # the 16 ring planes are cheap shifts (XLA handles these well);
    # the kernel fuses the ~150 elementwise arc/score ops that would
    # otherwise each round-trip an (H, W) intermediate through HBM.
    # Tiled over row blocks: a full 16-plane stack would need ~30 MB of
    # VMEM, and the kernel's live intermediates (16 diffs + arc masks)
    # also occupy the VMEM stack; 16-row tiles keep the whole working set
    # double-buffered inside the 16 MB budget.
    rings = jnp.stack([_shifted(img_f, du, dv) for du, dv in _CIRCLE])
    TH = 16
    hp = ((h + TH - 1) // TH) * TH
    if hp != h:
        rings = jnp.pad(rings, ((0, 0), (0, hp - h), (0, 0)))
        img_f = jnp.pad(img_f, ((0, hp - h), (0, 0)))

    def kernel(rings_ref, center_ref, out_ref):
        c = center_ref[:]
        diff = [rings_ref[i] - c for i in range(16)]
        bright = [d > threshold for d in diff]
        dark = [d < -threshold for d in diff]

        def contiguous(masks):
            ext = masks + masks[: _ARC - 1]
            out = None
            for k in range(16):
                acc = ext[k]
                for i in range(1, _ARC):
                    acc = acc & ext[k + i]
                out = acc if out is None else (out | acc)
            return out

        is_corner = contiguous(bright) | contiguous(dark)
        sad = None
        for d in diff:
            t = jnp.maximum(jnp.abs(d) - threshold, 0.0)
            sad = t if sad is None else sad + t
        out_ref[:] = jnp.where(is_corner, sad, 0.0)

    out = pl.pallas_call(
        kernel,
        grid=(hp // TH,),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.float32),
        in_specs=[
            pl.BlockSpec((16, TH, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TH, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rings, img_f)
    return out[:h]


def _nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where((score >= mx) & (score > 0), score, 0.0)


def _grid_topk(score: jnp.ndarray, cell: int, per_cell: int):
    """Top-``per_cell`` corners per (cell x cell) tile.  Returns flat
    (uv, score, valid) of size n_cells*per_cell."""
    h, w = score.shape
    gh, gw = h // cell, w // cell
    s = score[: gh * cell, : gw * cell]
    tiles = s.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(gh * gw, cell * cell)
    val, idx = jax.lax.top_k(tiles, per_cell)         # (C, per_cell)
    cy = (jnp.arange(gh * gw) // gw) * cell
    cx = (jnp.arange(gh * gw) % gw) * cell
    v = cy[:, None] + idx // cell
    u = cx[:, None] + idx % cell
    uv = jnp.stack([u, v], axis=-1).reshape(-1, 2).astype(jnp.float32)
    sc = val.reshape(-1)
    return uv, sc, sc > 0


class FastPyramidConfig(NamedTuple):
    n_features: int = 2500
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_threshold: float = 20.0
    min_threshold: float = 7.0
    cell: int = 32
    per_cell: int = 4


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_keypoints_batch(imgs: jnp.ndarray,
                           cfg: "FastPyramidConfig" = None):
    """Batched multi-frame detection (SURVEY.md section 2.3: the batched
    front-end replacing the reference's per-frame extraction loops):
    imgs (B, H, W) -> (uv (B, n, 2), score (B, n), valid (B, n)).  One
    compiled program amortizes pyramid+FAST over the frame batch."""
    cfg = cfg or FastPyramidConfig()
    return jax.vmap(lambda im: detect_keypoints(im, cfg))(imgs)


@functools.partial(
    jax.jit, static_argnames=("cfg",)
)
def detect_keypoints(img: jnp.ndarray, cfg: FastPyramidConfig = FastPyramidConfig()):
    """Multi-scale FAST detection with even spatial distribution.

    Returns (uv, score, valid) with shape caps n_features; uv in level-0
    pixel coordinates (integral, like the reference's keypoints).
    """
    h, w = img.shape
    img_f = img.astype(jnp.float32)
    all_uv, all_sc, all_va = [], [], []
    for lvl in range(cfg.n_levels):
        s = cfg.scale_factor ** lvl
        lh, lw = int(round(h / s)), int(round(w / s))
        if min(lh, lw) < 32:
            break
        lvl_img = (
            img_f if lvl == 0
            else jax.image.resize(img_f, (lh, lw), "linear")
        )
        # the fused Pallas kernel on TPU; the XLA formulation elsewhere
        on_tpu = jax.default_backend() in ("tpu", "axon")
        score_fn = fast_score_map_pallas if on_tpu else fast_score_map
        score = score_fn(lvl_img, cfg.ini_threshold)
        # two-pass thresholds (ORBextractor.cc:790-810): where the strict
        # threshold found nothing in a cell, the weak one fills in.
        score_min = score_fn(lvl_img, cfg.min_threshold)
        score = _nms3(jnp.where(score > 0, score, 0.25 * score_min))
        cell = max(cfg.cell // int(round(s)), 8)
        uv, sc, va = _grid_topk(score, cell, cfg.per_cell)
        all_uv.append(jnp.round(uv * s))
        all_sc.append(sc)
        all_va.append(va)
    uv = jnp.concatenate(all_uv)
    sc = jnp.concatenate(all_sc)
    va = jnp.concatenate(all_va)
    # global top-n_features by response among valid
    order = jax.lax.top_k(jnp.where(va, sc, -1.0), cfg.n_features)[1]
    uv_out = uv[order]
    sc_out = sc[order]
    va_out = va[order] & (sc_out > 0)
    return uv_out, sc_out, va_out
