import numpy as np

from sdpl_slam_tpu.models.map_state import MapState


def test_map_checkpoint_roundtrip(tmp_path, rng):
    m = MapState()
    m.camera_poses.append(np.eye(4, dtype=np.float32))
    m.stat_uv.append(rng.normal(size=(10, 2)).astype(np.float32))
    m.rigid_motions.append([np.eye(4, dtype=np.float32)])
    m.rm_labels.append([0])
    p = tmp_path / "map.ckpt"
    m.save(p)
    m2 = MapState.load(p)
    assert m2.n_frames == 1
    np.testing.assert_array_equal(m2.stat_uv[0], m.stat_uv[0])
    assert m2.rm_labels == [[0]]
