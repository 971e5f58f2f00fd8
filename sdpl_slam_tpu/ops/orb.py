"""ORB descriptors: intensity-centroid orientation + rotated BRIEF, and
Hamming matching as a +/-1 matmul on the MXU.

Parity notes (vs /root/reference/src/ORBextractor.cc):
* Orientation is the intensity-centroid angle over a circular patch
  (``IC_Angle``, ORBextractor.cc:66-95) -- replicated exactly.
* The 256 BRIEF point pairs: the reference embeds OpenCV's learned
  ``bit_pattern_31_`` table (ORBextractor.cc:139-396).  Descriptors are a
  DEAD output in this pipeline -- matching is optical-flow-driven, the
  reference never matches descriptors (SURVEY.md section 2.1) -- so this
  module uses a deterministic seeded Gaussian pattern (the original BRIEF
  construction) instead of copying the table; any fixed pattern yields the
  same downstream behavior.
* Matching (for the resurrected-retrieval use case): Hamming distance via
  the +/-1 encoding:  ham = (256 - A B^T) / 2  -- one f32 matmul on the
  MXU instead of XOR+popcount loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PATCH = 31
HALF = PATCH // 2
N_BITS = 256


@functools.lru_cache()
def _pattern() -> np.ndarray:
    """(256, 4) int8 offsets (x1, y1, x2, y2), BRIEF-style Gaussian
    (sigma = patch/5), clipped to the patch."""
    rng = np.random.default_rng(31)
    p = rng.normal(0.0, PATCH / 5.0, size=(N_BITS, 4))
    return np.clip(np.round(p), -HALF + 2, HALF - 2).astype(np.int8)


def _gather_patches(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """(N, PATCH, PATCH) patches centred at integral uv (clamped)."""
    h, w = img.shape
    pad = HALF + 1
    p = jnp.pad(img.astype(jnp.float32), pad, mode="edge")
    base_u = jnp.clip(uv[:, 0].astype(jnp.int32), 0, w - 1) + pad - HALF
    base_v = jnp.clip(uv[:, 1].astype(jnp.int32), 0, h - 1) + pad - HALF

    def one(bu, bv):
        return jax.lax.dynamic_slice(p, (bv, bu), (PATCH, PATCH))

    return jax.vmap(one)(base_u, base_v)


@functools.lru_cache()
def _circular_mask() -> np.ndarray:
    ys, xs = np.mgrid[-HALF:HALF + 1, -HALF:HALF + 1]
    return (xs * xs + ys * ys <= HALF * HALF).astype(np.float32)


def ic_angle(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation (radians) per keypoint
    (``IC_Angle``, ORBextractor.cc:66-95)."""
    patches = _gather_patches(img, uv)
    mask = jnp.asarray(_circular_mask())
    ys, xs = np.mgrid[-HALF:HALF + 1, -HALF:HALF + 1]
    m01 = jnp.sum(patches * mask * jnp.asarray(ys, jnp.float32), axis=(1, 2))
    m10 = jnp.sum(patches * mask * jnp.asarray(xs, jnp.float32), axis=(1, 2))
    return jnp.arctan2(m01, m10)


@jax.jit
def brief_descriptors(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """256-bit rotated-BRIEF descriptors -> (N, 256) uint8 bits.

    The image should be pre-smoothed (the reference GaussianBlurs each
    pyramid level, ORBextractor.cc:1105); a 3x3 box blur is applied here.
    """
    img = img.astype(jnp.float32)
    p = jnp.pad(img, 1, mode="edge")
    img_s = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 1:-1] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    ) / 9.0
    ang = ic_angle(img_s, uv)
    patches = _gather_patches(img_s, uv)               # (N, 31, 31)
    pat = jnp.asarray(_pattern(), jnp.float32)          # (256, 4)
    c, s = jnp.cos(ang), jnp.sin(ang)                   # (N,)

    def rot(x, y):
        # rotated offsets per keypoint: (N, 256)
        xr = c[:, None] * x[None] - s[:, None] * y[None]
        yr = s[:, None] * x[None] + c[:, None] * y[None]
        xi = jnp.clip(jnp.round(xr).astype(jnp.int32) + HALF, 0, PATCH - 1)
        yi = jnp.clip(jnp.round(yr).astype(jnp.int32) + HALF, 0, PATCH - 1)
        return yi * PATCH + xi

    flat = patches.reshape(patches.shape[0], -1)
    i1 = rot(pat[:, 0], pat[:, 1])
    i2 = rot(pat[:, 2], pat[:, 3])
    v1 = jnp.take_along_axis(flat, i1, axis=1)
    v2 = jnp.take_along_axis(flat, i2, axis=1)
    return (v1 < v2).astype(jnp.uint8)


@jax.jit
def hamming_distance_matrix(a_bits: jnp.ndarray,
                            b_bits: jnp.ndarray) -> jnp.ndarray:
    """(N, 256) x (M, 256) bit arrays -> (N, M) Hamming distances via the
    +/-1-encoding matmul: ham = (256 - A B^T)/2 -- runs on the MXU (the
    'XOR-popcount as matmul' formulation)."""
    a = a_bits.astype(jnp.float32) * 2.0 - 1.0
    b = b_bits.astype(jnp.float32) * 2.0 - 1.0
    dot = jnp.matmul(a, b.T, precision=jax.lax.Precision.DEFAULT)
    return 0.5 * (a_bits.shape[1] - dot)


def match_descriptors(a_bits: jnp.ndarray, b_bits: jnp.ndarray,
                      max_distance: int = 64):
    """Mutual nearest-neighbour Hamming matching -> (idx_b_for_a, valid)."""
    d = hamming_distance_matrix(a_bits, b_bits)
    best_ab = jnp.argmin(d, axis=1)
    best_ba = jnp.argmin(d, axis=0)
    mutual = best_ba[best_ab] == jnp.arange(a_bits.shape[0])
    dist = jnp.take_along_axis(d, best_ab[:, None], axis=1)[:, 0]
    return best_ab, mutual & (dist <= max_distance)
