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


def test_lbd_float_descriptor_structure(rng):
    img = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    segs = rng.uniform([10, 10, 10, 10], [110, 80, 110, 80],
                       (8, 4)).astype(np.float32)
    des = np.asarray(lbd.lbd_float_descriptors(jnp.asarray(img),
                                               jnp.asarray(segs)))
    assert des.shape == (8, 72)          # 9 bands x 8 stats
    assert (des >= 0).all()
    # clamped at 0.4 then renormalized to unit length
    # (binary_descriptor_custom.cpp:1316-1340)
    np.testing.assert_allclose(np.linalg.norm(des, axis=1), 1.0, atol=1e-5)
    assert des.max() <= 0.4 / 0.4 + 1e-6  # <= 1 after renorm; no hard cap


def test_lbd_binarization_is_band_pair_comparison(rng):
    """Bits are exactly elementwise comparisons over the reference's 32
    band-pair combinations table (binaryConversion, :401-412)."""
    img = rng.integers(0, 255, (96, 128)).astype(np.uint8)
    segs = rng.uniform([10, 10, 10, 10], [110, 80, 110, 80],
                       (5, 4)).astype(np.float32)
    des = np.asarray(lbd.lbd_float_descriptors(jnp.asarray(img),
                                               jnp.asarray(segs)))
    bits = np.asarray(lbd.lbd_descriptors(jnp.asarray(img),
                                          jnp.asarray(segs)))
    per_band = des.reshape(-1, 9, 8)
    expect = np.zeros((len(segs), 256), np.uint8)
    for c, (b1, b2) in enumerate(lbd._COMBINATIONS):
        for i in range(8):
            expect[:, c * 8 + i] = (
                per_band[:, b1, i] > per_band[:, b2, i]
            ).astype(np.uint8)
    np.testing.assert_array_equal(bits, expect)


def test_lbd_combinations_table_is_reference():
    # pin the table (binary_descriptor_custom.cpp:74-106)
    assert lbd._COMBINATIONS.shape == (32, 2)
    assert (lbd._COMBINATIONS[:, 0] < lbd._COMBINATIONS[:, 1]).all()
    # first and last rows of the reference table
    assert list(lbd._COMBINATIONS[0]) == [0, 1]
    assert list(lbd._COMBINATIONS[-1]) == [7, 8]
    # bands 0/1 never pair beyond band 6; bands 2+ pair through band 8
    assert lbd._COMBINATIONS[lbd._COMBINATIONS[:, 0] <= 1, 1].max() == 6
