import jax.numpy as jnp
import numpy as np

from sdpl_slam_tpu.ops import orb


def textured_image(rng, h=128, w=160):
    return rng.integers(0, 255, (h, w)).astype(np.uint8)


def test_descriptor_invariance_to_translation(rng):
    """The same patch content at different positions gives the same bits."""
    img = textured_image(rng)
    big = np.zeros((256, 256), np.uint8)
    big[20:148, 30:190] = img
    big2 = np.zeros((256, 256), np.uint8)
    big2[60:188, 50:210] = img
    uv1 = np.array([[30 + 80, 20 + 64]], np.float32)
    uv2 = np.array([[50 + 80, 60 + 64]], np.float32)
    d1 = np.asarray(orb.brief_descriptors(jnp.asarray(big), jnp.asarray(uv1)))
    d2 = np.asarray(orb.brief_descriptors(jnp.asarray(big2), jnp.asarray(uv2)))
    assert (d1 != d2).mean() < 0.05


def test_matching_under_translation(rng):
    img = textured_image(rng, 192, 256)
    shift = 7
    img2 = np.roll(img, (0, shift), (0, 1))
    uv = rng.uniform([40, 40], [216, 152], size=(60, 2)).astype(np.float32)
    uv2 = uv + [shift, 0]
    d1 = orb.brief_descriptors(jnp.asarray(img), jnp.asarray(uv))
    d2 = orb.brief_descriptors(jnp.asarray(img2), jnp.asarray(uv2))
    idx, valid = orb.match_descriptors(d1, d2)
    idx, valid = np.asarray(idx), np.asarray(valid)
    correct = (idx == np.arange(60)) & valid
    assert correct.mean() > 0.9, correct.mean()


def test_hamming_matmul_matches_bitcount(rng):
    a = rng.integers(0, 2, (17, 256)).astype(np.uint8)
    b = rng.integers(0, 2, (23, 256)).astype(np.uint8)
    d = np.asarray(orb.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(d.astype(np.int32), ref)


def test_ic_angle_rotates(rng):
    """A gradient patch rotated by 90 degrees rotates the IC angle."""
    ys, xs = np.mgrid[0:64, 0:64]
    img = (xs * 4).astype(np.uint8)          # gradient along +x
    img90 = (ys * 4).astype(np.uint8)        # gradient along +y
    uv = np.array([[32, 32]], np.float32)
    a1 = float(orb.ic_angle(jnp.asarray(img, jnp.float32), jnp.asarray(uv))[0])
    a2 = float(orb.ic_angle(jnp.asarray(img90, jnp.float32), jnp.asarray(uv))[0])
    assert abs(a1) < 0.1
    assert abs(a2 - np.pi / 2) < 0.1
