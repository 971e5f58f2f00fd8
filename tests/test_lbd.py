import jax.numpy as jnp
import numpy as np

from sdpl_slam_tpu.ops import lbd, orb


def test_lbd_translation_stability(rng):
    img = rng.integers(0, 255, (192, 320)).astype(np.uint8)
    img2 = np.roll(img, (0, 5), (0, 1))
    segs = rng.uniform([40, 40, 40, 40], [260, 150, 260, 150],
                       (20, 4)).astype(np.float32)
    segs2 = segs + [5, 0, 5, 0]
    d1 = lbd.lbd_descriptors(jnp.asarray(img), jnp.asarray(segs))
    d2 = lbd.lbd_descriptors(jnp.asarray(img2), jnp.asarray(segs2))
    same = np.asarray(orb.hamming_distance_matrix(d1, d2))
    # the matching line has the smallest distance for most lines
    correct = (same.argmin(axis=1) == np.arange(20)).mean()
    assert correct > 0.8, correct


def test_lbd_shapes(rng):
    img = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    segs = np.array([[10, 10, 100, 80]], np.float32)
    d = lbd.lbd_descriptors(jnp.asarray(img), jnp.asarray(segs))
    assert d.shape == (1, 256)
    assert set(np.unique(np.asarray(d))) <= {0, 1}
