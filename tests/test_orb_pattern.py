"""Bit-exactness of the rBRIEF descriptor against the reference formula.

The oracle here is an independent SCALAR transcription of
``computeOrbDescriptor`` (/root/reference/src/ORBextractor.cc:97-137) and
``IC_Angle`` + the umax setup (:66-95, :443-457), evaluated in plain
Python over injected patches — same patch, same angle, same 256 bits.
"""

import math

import numpy as np
import jax.numpy as jnp

from sdpl_slam_tpu.ops import orb
from sdpl_slam_tpu.ops.orb_pattern import BIT_PATTERN_31


# the canonical ORB circular-patch bounds for HALF_PATCH_SIZE=15
UMAX_EXPECTED = [15, 15, 15, 15, 14, 14, 14, 13, 13, 12, 11, 10, 9, 8, 6, 3]


def _oracle_bits(patch: np.ndarray, angle: float) -> np.ndarray:
    """computeOrbDescriptor on a (37, 37) patch centred at (18, 18)."""
    a, b = math.cos(angle), math.sin(angle)
    c0 = orb.R_EXT

    def val(x, y):
        col = int(np.rint(x * a - y * b))
        row = int(np.rint(x * b + y * a))
        return patch[c0 + row, c0 + col]

    bits = np.zeros(256, np.uint8)
    for i, (x1, y1, x2, y2) in enumerate(BIT_PATTERN_31.astype(int)):
        bits[i] = 1 if val(x1, y1) < val(x2, y2) else 0
    return bits


def _oracle_ic_angle(patch31: np.ndarray) -> float:
    """IC_Angle over a (31, 31) patch centred at (15, 15)."""
    h = 15
    m01 = 0
    m10 = 0
    for u in range(-h, h + 1):
        m10 += u * int(patch31[h, h + u])
    for v in range(1, h + 1):
        v_sum = 0
        d = UMAX_EXPECTED[v]
        for u in range(-d, d + 1):
            vp = int(patch31[h + v, h + u])
            vm = int(patch31[h - v, h + u])
            v_sum += vp - vm
            m10 += u * (vp + vm)
        m01 += v * v_sum
    return math.atan2(m01, m10)


def test_umax_matches_reference():
    assert list(orb._umax()) == UMAX_EXPECTED


def test_descriptor_bits_exact():
    rng = np.random.default_rng(7)
    n = 16
    patches = rng.integers(0, 256, size=(n, 37, 37)).astype(np.float32)
    angles = rng.uniform(-np.pi, np.pi, size=n).astype(np.float32)
    got = np.asarray(
        orb.descriptor_bits_at_angle(jnp.asarray(patches),
                                     jnp.asarray(angles))
    )
    for i in range(n):
        want = _oracle_bits(patches[i], float(angles[i]))
        np.testing.assert_array_equal(got[i], want, err_msg=f"kp {i}")


def test_ic_angle_exact():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(64, 64)).astype(np.float32)
    uv = np.array([[31, 31], [20, 40], [40, 20]], np.float32)
    got = np.asarray(orb.ic_angle(jnp.asarray(img), jnp.asarray(uv)))
    for i, (u, v) in enumerate(uv.astype(int)):
        patch = img[v - 15:v + 16, u - 15:u + 16]
        want = _oracle_ic_angle(patch)
        assert abs(float(got[i]) - want) < 1e-5, (i, float(got[i]), want)


def test_full_descriptor_pipeline_runs():
    """brief_descriptors end-to-end: smoothing + angle + bits; the bits
    must equal the oracle applied to the SAME smoothed image."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(96, 128)).astype(np.float32)
    uv = np.array([[40, 40], [60, 50], [80, 30]], np.float32)
    d = np.asarray(orb.brief_descriptors(jnp.asarray(img), jnp.asarray(uv)))
    assert d.shape == (3, 256) and set(np.unique(d)) <= {0, 1}
    img_s = np.asarray(orb._gaussian_blur_7x7(jnp.asarray(img)))
    ang = np.asarray(orb.ic_angle(jnp.asarray(img_s), jnp.asarray(uv)))
    for i, (u, v) in enumerate(uv.astype(int)):
        patch = img_s[v - 18:v + 19, u - 18:u + 19]
        want = _oracle_bits(patch, float(ang[i]))
        np.testing.assert_array_equal(d[i], want)
