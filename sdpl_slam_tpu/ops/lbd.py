"""Line Band Descriptor (LBD) equivalent: batched band-gradient statistics.

The reference computes 256-bit LBD descriptors over line-support-region
band gradients (3rdparty/line_descriptor BinaryDescriptor,
/root/reference/3rdparty/line_descriptor/src/binary_descriptor_custom.cpp)
-- and then never matches with them at runtime (tracking is flow-driven;
SURVEY.md section 2.1).  This TPU formulation samples a fixed line-support
grid per segment (S samples along x B bands across), rotates gradients
into the line frame, reduces per-band means/std-devs of the four signed
gradient components (the LBD band statistics), and binarizes adjacent-band
comparisons into a 256-bit code compatible with
:func:`..ops.orb.hamming_distance_matrix`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

N_SAMPLES = 32       # samples along the line
N_BANDS = 9          # bands across the line (LBD default 9 x width 7)
BAND_WIDTH = 7.0     # pixels across all bands


def _grad(img):
    img = img.astype(jnp.float32)
    p = jnp.pad(img, 1, mode="edge")
    gx = 0.5 * (p[1:-1, 2:] - p[1:-1, :-2])
    gy = 0.5 * (p[2:, 1:-1] - p[:-2, 1:-1])
    return gx, gy


def _bilinear(img, u, v):
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    a = img[v0, u0]
    b = img[v0, u0 + 1]
    c = img[v0 + 1, u0]
    d = img[v0 + 1, u0 + 1]
    return (
        a * (1 - du) * (1 - dv) + b * du * (1 - dv)
        + c * (1 - du) * dv + d * du * dv
    )


@jax.jit
def lbd_descriptors(img: jnp.ndarray, uv4: jnp.ndarray) -> jnp.ndarray:
    """(L, 4) segments -> (L, 256) uint8 bit descriptors."""
    gx, gy = _grad(img)
    s = uv4[:, :2]
    e = uv4[:, 2:]
    d = e - s
    length = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    u_dir = d / length                            # along-line unit
    n_dir = jnp.stack([-u_dir[:, 1], u_dir[:, 0]], -1)  # across-line unit

    ts = jnp.linspace(0.05, 0.95, N_SAMPLES)
    bs = (jnp.arange(N_BANDS) - (N_BANDS - 1) / 2) * (BAND_WIDTH / N_BANDS)
    # sample grid: (L, S, B, 2)
    base = s[:, None, :] + ts[None, :, None] * d[:, None, :]
    pts = base[:, :, None, :] + bs[None, None, :, None] * n_dir[:, None, None, :]
    pu, pv = pts[..., 0], pts[..., 1]
    sgx = _bilinear(gx, pu, pv)
    sgy = _bilinear(gy, pu, pv)
    # gradients in the line frame
    g_par = sgx * u_dir[:, None, None, 0] + sgy * u_dir[:, None, None, 1]
    g_per = sgx * n_dir[:, None, None, 0] + sgy * n_dir[:, None, None, 1]
    # LBD band stats: means+stds of (g_per+, g_per-, g_par+, g_par-)
    comps = jnp.stack([
        jnp.maximum(g_per, 0), jnp.maximum(-g_per, 0),
        jnp.maximum(g_par, 0), jnp.maximum(-g_par, 0),
    ], axis=-1)                                    # (L, S, B, 4)
    mean = comps.mean(axis=1)                      # (L, B, 4)
    std = comps.std(axis=1)
    feat = jnp.concatenate([mean, std], -1).reshape(uv4.shape[0], -1)
    # (L, B*8 = 72) -> 256 bits by pairwise comparisons on a fixed pattern
    k = feat.shape[1]
    import numpy as _np

    rng = _np.random.default_rng(7)
    ii = jnp.asarray(rng.integers(0, k, 256))
    jj = jnp.asarray((rng.integers(1, k, 256) + rng.integers(0, k, 256)) % k)
    return (feat[:, ii] > feat[:, jj]).astype(jnp.uint8)
