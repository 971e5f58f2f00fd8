import numpy as np
import pytest

from sdpl_slam_tpu.io import dataset, native
from sdpl_slam_tpu.io.prefetch import FramePrefetcher


def test_flo_roundtrip(tmp_path, rng):
    flow = rng.normal(size=(48, 64, 2)).astype(np.float32)
    p = tmp_path / "t.flo"
    dataset.write_flo(p, flow)
    out = dataset.read_flo(p)
    np.testing.assert_array_equal(out, flow)


def test_native_library_builds():
    assert native.available(), "native toolchain should build libsdpl_io.so"


def test_native_mask_parse_matches_loadtxt(tmp_path, rng):
    mask = rng.integers(-1, 30, size=(37, 53)).astype(np.int32)
    p = tmp_path / "m.txt"
    np.savetxt(p, mask, fmt="%d")
    ref = np.loadtxt(p, dtype=np.int32)
    out = dataset.read_mask_txt(p, shape=mask.shape)
    np.testing.assert_array_equal(out, ref)


def test_native_flo_matches_python(tmp_path, rng):
    flow = rng.normal(size=(37, 61, 2)).astype(np.float32)
    p = tmp_path / "t.flo"
    dataset.write_flo(p, flow)
    out = native.read_flo(str(p))
    assert out is not None
    np.testing.assert_array_equal(out, flow)


def test_sequence_loader(tmp_path, rng):
    # build a tiny on-disk sequence in the reference layout
    import cv2

    root = tmp_path / "seq"
    for d in ("image_0", "depth", "semantic", "flow"):
        (root / d).mkdir(parents=True)
    h, w, n = 24, 32, 3
    np.savetxt(root / "times.txt", np.arange(n) * 0.1, fmt="%.6f")
    poses = []
    for i in range(n):
        cv2.imwrite(str(root / "image_0" / f"{i:06d}.png"),
                    rng.integers(0, 255, (h, w)).astype(np.uint8))
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"),
                    rng.integers(0, 65535, (h, w)).astype(np.uint16))
        np.savetxt(root / "semantic" / f"{i:06d}.txt",
                   rng.integers(0, 3, (h, w)), fmt="%d")
        dataset.write_flo(root / "flow" / f"{i:06d}.flo",
                          rng.normal(size=(h, w, 2)).astype(np.float32))
        row = [i] + list(np.eye(4).ravel())
        poses.append(row)
    np.savetxt(root / "pose_gt.txt", np.asarray(poses), fmt="%.6f")
    np.savetxt(root / "object_pose.txt",
               np.asarray([[0, 1, 0, 0, 0, 0, 1.0, 2.0, 3.0, 0.1]]),
               fmt="%.6f")

    seq = dataset.load_sequence(root)
    assert seq.n_frames == 2
    gray, depth, flow, mask = seq.frame(0)
    assert gray.shape == (h, w) and depth.dtype == np.float32
    assert flow.shape == (h, w, 2) and mask.shape == (h, w)
    assert len(seq.gt_obj_poses(0)) == 1
    np.testing.assert_allclose(seq.gt_pose(1), np.eye(4))


def test_batched_frame_load_matches_per_file(tmp_path, rng):
    """Sequence.frame's batched path (ONE native read_files_batch
    submission + in-memory parsers) must produce byte-identical arrays
    to the per-file readers."""
    import cv2

    if not native.available():
        pytest.skip("native toolchain unavailable")

    root = tmp_path / "seq"
    for d in ("image_0", "depth", "semantic", "flow"):
        (root / d).mkdir(parents=True)
    h, w, n = 31, 47, 2
    np.savetxt(root / "times.txt", np.arange(n) * 0.1, fmt="%.6f")
    for i in range(n):
        cv2.imwrite(str(root / "image_0" / f"{i:06d}.png"),
                    rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"),
                    rng.integers(0, 65535, (h, w)).astype(np.uint16))
        np.savetxt(root / "semantic" / f"{i:06d}.txt",
                   rng.integers(-1, 5, (h, w)), fmt="%d")
        dataset.write_flo(root / "flow" / f"{i:06d}.flo",
                          rng.normal(size=(h, w, 2)).astype(np.float32))

    seq = dataset.load_sequence(root)
    gray, depth, flow, mask = seq.frame(0)
    # per-file reference
    g2 = dataset.read_image_gray(root / "image_0" / "000000.png")
    d2 = dataset.read_depth_png(root / "depth" / "000000.png")
    f2 = dataset.read_flo(root / "flow" / "000000.flo")
    m2 = dataset.read_mask_txt(root / "semantic" / "000000.txt",
                               shape=(h, w))
    np.testing.assert_array_equal(gray, g2)
    np.testing.assert_array_equal(depth, d2)
    np.testing.assert_array_equal(flow, f2)
    np.testing.assert_array_equal(mask, m2)
    # the batched reader must have actually run (either kernel mode)
    assert native.last_batch_mode in (0, 1)


def test_prefetcher_batched_load_threaded(tmp_path, rng):
    """FramePrefetcher drives Sequence.frame from worker THREADS; the
    per-call io_uring rings must be thread-safe and the prefetched
    frames identical to direct loads."""
    import cv2

    if not native.available():
        pytest.skip("native toolchain unavailable")

    root = tmp_path / "seq"
    for d in ("image_0", "depth", "semantic", "flow"):
        (root / d).mkdir(parents=True)
    h, w, n = 24, 32, 6
    np.savetxt(root / "times.txt", np.arange(n) * 0.1, fmt="%.6f")
    for i in range(n):
        cv2.imwrite(str(root / "image_0" / f"{i:06d}.png"),
                    rng.integers(0, 255, (h, w)).astype(np.uint8))
        cv2.imwrite(str(root / "depth" / f"{i:06d}.png"),
                    rng.integers(0, 65535, (h, w)).astype(np.uint16))
        np.savetxt(root / "semantic" / f"{i:06d}.txt",
                   rng.integers(0, 3, (h, w)), fmt="%d")
        dataset.write_flo(root / "flow" / f"{i:06d}.flo",
                          rng.normal(size=(h, w, 2)).astype(np.float32))

    seq = dataset.load_sequence(root)
    direct = [seq.frame(i) for i in range(seq.n_frames)]
    pf = FramePrefetcher(seq.frame, seq.n_frames, lookahead=3, workers=2)
    for i, frame in pf:
        for a, b in zip(frame, direct[i]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_buffer_parsers_match_path_readers(tmp_path, rng):
    """parse_png / parse_flo / parse_int_matrix_bytes (the in-memory
    cores) must match their path-based wrappers."""
    import cv2

    if not native.available():
        pytest.skip("native toolchain unavailable")

    z = rng.integers(0, 65535, (23, 29)).astype(np.uint16)
    p = str(tmp_path / "z.png")
    cv2.imwrite(p, z)
    data = open(p, "rb").read()
    np.testing.assert_array_equal(native.parse_png(data),
                                  native.read_png(p))

    flow = rng.normal(size=(17, 19, 2)).astype(np.float32)
    pf = tmp_path / "t.flo"
    dataset.write_flo(pf, flow)
    np.testing.assert_array_equal(
        native.parse_flo(open(pf, "rb").read()), flow)

    mask = rng.integers(-2, 9, (13, 21)).astype(np.int32)
    pm = tmp_path / "m.txt"
    np.savetxt(pm, mask, fmt="%d")
    np.testing.assert_array_equal(
        native.parse_int_matrix_bytes(open(pm, "rb").read(), 13, 21),
        mask)

    # graceful failure: corrupt PNG body must return None, not crash
    assert native.parse_png(data[:40] + b"\x00" * 10) is None


def test_prefetcher_order_and_laziness():
    loaded = []

    def load(i):
        loaded.append(i)
        return i * 10

    out = list(FramePrefetcher(load, 7, lookahead=2))
    assert [v for _, v in out] == [i * 10 for i in range(7)]
    assert sorted(loaded) == list(range(7))


def test_native_png_decoder(tmp_path):
    """Native libpng decode (native/sdpl_io.cpp sdpl_read_png) must match
    cv2.imread bit-for-bit on gray8 / depth16 and within luma rounding on
    RGB (the loader hot path, example/sdpl_slam.cc:104-113)."""
    import cv2

    from sdpl_slam_tpu.io import native
    from sdpl_slam_tpu.io.dataset import read_depth_png, read_image_gray

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    g = rng.integers(0, 255, (37, 53), np.uint8)
    p1 = str(tmp_path / "g8.png")
    cv2.imwrite(p1, g)
    out = native.read_png(p1)
    assert out.dtype == np.uint8 and np.array_equal(out, g)
    assert np.array_equal(read_image_gray(p1), g)

    z = rng.integers(0, 65535, (37, 53)).astype(np.uint16)
    p2 = str(tmp_path / "d16.png")
    cv2.imwrite(p2, z)
    out = native.read_png(p2)
    assert out.dtype == np.uint16 and np.array_equal(out, z)
    assert np.allclose(read_depth_png(p2), z.astype(np.float32))

    c = rng.integers(0, 255, (37, 53, 3), np.uint8)
    p3 = str(tmp_path / "rgb.png")
    cv2.imwrite(p3, c)                       # cv2 writes BGR
    out = native.read_png(p3)                # PNG stores RGB
    assert out.shape == (37, 53, 3)
    assert np.array_equal(out[..., 0], c[..., 2])
    gg = read_image_gray(p3)
    ref = cv2.cvtColor(c, cv2.COLOR_BGR2GRAY)
    assert np.max(np.abs(gg.astype(int) - ref.astype(int))) <= 1


def test_gray_alpha_and_16bit_conventions(tmp_path):
    """Advisor r3 regressions: a gray+alpha PNG (color type 4) must decode
    through read_image_gray without crashing (channel 0 = luma), and
    16-bit grayscale must yield the same dtype/values on the native and
    cv2 paths."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    from sdpl_slam_tpu.io import dataset, native

    rng = np.random.default_rng(1)
    g = rng.integers(0, 255, (21, 33), np.uint8)
    ga = np.dstack([g, np.full_like(g, 200)])
    p = str(tmp_path / "ga.png")
    PIL.fromarray(ga, mode="LA").save(p)
    out = dataset.read_image_gray(p)
    assert out.shape == g.shape and np.array_equal(out, g)

    z = rng.integers(0, 65535, (21, 33)).astype(np.uint16)
    p16 = str(tmp_path / "g16.png")
    PIL.fromarray(z, mode="I;16").save(p16)
    a = dataset.read_image_gray(p16)
    if native.available():
        # the native path and the cv2 fallback must agree (one convention)
        import cv2

        b = cv2.imread(p16, cv2.IMREAD_UNCHANGED)
        assert a.dtype == b.dtype and np.array_equal(a, b)
