import numpy as np
import jax.numpy as jnp


def test_quadtree_build_and_knn():
    from ssrlcv_tpu.mesh.quadtree import build_quadtree, knn_2d, node_counts_2d

    rng = np.random.default_rng(0)
    locs = jnp.asarray(rng.uniform(0, 100, (256, 2)).astype(np.float32))
    tree = build_quadtree(locs, jnp.ones(256, bool))
    assert (np.diff(np.asarray(tree.keys).astype(np.int64)) >= 0).all()
    idx, dist = knn_2d(tree, k=4, window=48)
    assert np.isfinite(np.asarray(dist)).all()
    assert node_counts_2d(tree, 2) <= 16


def test_csv_round_trip(tmp_path):
    from ssrlcv_tpu.io.csvio import read_csv, write_csv

    p = write_csv([1.5, 2.5, (3, 4)], str(tmp_path / "t"), header="a,b")
    rows = read_csv(p)
    assert rows[0] == ["a", "b"]
    assert rows[1] == ["1.5"]
    assert rows[3] == ["3", "4"]


def test_match_file_round_trip(tmp_path):
    from ssrlcv_tpu.io.csvio import read_match_file, write_match_file

    rng = np.random.default_rng(1)
    l0 = rng.uniform(0, 1000, (50, 2)).astype(np.float32)
    l1 = rng.uniform(0, 1000, (50, 2)).astype(np.float32)
    for binary in (True, False):
        p = write_match_file(l0, l1, str(tmp_path / f"m_{binary}"), binary=binary)
        a, b = read_match_file(p, binary=binary)
        np.testing.assert_allclose(a, l0, rtol=1e-6)
        np.testing.assert_allclose(b, l1, rtol=1e-6)


def test_bcp_round_trip(tmp_path):
    from ssrlcv_tpu.io.csvio import read_bcp, write_bcp

    cams = [
        {
            "cam_pos": [1.0, 2.0, 3.0],
            "cam_rot": [0.1, 0.2, 0.3],
            "fov": [0.04, 0.04],
            "foc": 0.86,
            "dpix": [3.5e-5, 3.5e-5],
            "timestamp": 1234,
        }
    ]
    p = write_bcp(str(tmp_path / "cams.bcp"), cams)
    back = read_bcp(p)
    np.testing.assert_allclose(back[0]["cam_pos"], cams[0]["cam_pos"])
    assert back[0]["timestamp"] == 1234
