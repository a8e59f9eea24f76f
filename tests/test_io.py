import os

import numpy as np

from ssrlcv_tpu.io import ply
from ssrlcv_tpu.io import checkpoint as cp


def test_ply_round_trip_binary(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    colors = np.random.default_rng(1).integers(0, 255, (100, 3)).astype(np.uint8)
    p = ply.write_ply(str(tmp_path / "cloud"), pts, colors=colors, binary=True)
    back = ply.read_ply(p)
    np.testing.assert_allclose(back["points"], pts, rtol=1e-6)
    np.testing.assert_array_equal(back["colors"], colors)


def test_ply_round_trip_ascii_faces(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    p = ply.write_ply(str(tmp_path / "mesh.ply"), pts, faces=faces, binary=False)
    back = ply.read_ply(p)
    np.testing.assert_allclose(back["points"], pts, atol=1e-5)
    np.testing.assert_array_equal(back["faces"], faces)


def test_ply_gradient_colors(tmp_path):
    pts = np.zeros((5, 3), np.float32)
    vals = np.array([0.0, 0.25, 0.5, 0.75, 1.0], np.float32)
    p = ply.write_ply_gradient(str(tmp_path / "grad.ply"), pts, vals)
    back = ply.read_ply(p)
    # low values blue, high values red
    assert back["colors"][0, 2] == 255 and back["colors"][0, 0] == 0
    assert back["colors"][-1, 0] == 255 and back["colors"][-1, 2] == 0


def test_checkpoint_stage_door(tmp_path):
    import jax.numpy as jnp

    from ssrlcv_tpu.core.types import MatchSet

    root = str(tmp_path / "ckpt")
    ms = MatchSet.empty(16, 2)
    ms = ms.replace(mask=ms.mask.at[0].set(True))
    assert cp.first_unfinished_stage(root, 6) == 0
    cp.save_stage(root, 0, "matches", ms, meta={"n": 1})
    assert cp.is_stage_done(root, 0)
    assert cp.first_unfinished_stage(root, 6) == 1
    back = cp.load_stage(root, 0, "matches", MatchSet.empty(16, 2))
    assert bool(back.mask[0]) and not bool(back.mask[1])
    assert cp.load_stage_meta(root, 0) == {"n": 1}


def test_checkpoint_shape_mismatch_raises(tmp_path):
    import pytest

    from ssrlcv_tpu.core.types import MatchSet

    root = str(tmp_path / "ckpt2")
    cp.save_stage(root, 0, "matches", MatchSet.empty(16, 2))
    with pytest.raises(ValueError):
        cp.load_stage(root, 0, "matches", MatchSet.empty(32, 2))


def test_logger_csv(tmp_path):
    from ssrlcv_tpu.logging import Logger

    lg = Logger(log_dir=str(tmp_path), filename="t.log")
    lg.log_state("start")
    with lg.phase("stage1"):
        lg.info("hello")
    lg.err("bad thing")
    lg.close()
    rows = open(tmp_path / "t.log").read().strip().splitlines()
    tags = [r.split(",")[1] for r in rows]
    assert tags == ["state", "state", "info", "state", "info", "error"]
    assert all(r.split(",")[0].isdigit() for r in rows)
