"""Readers for the reference framework's binary fixture formats.

The reference (uga-ssrl/SSRLCV) checkpoints arrays as ``.uty`` files
(Unity<T>::checkpoint, Unity.cuh:924-971) and camera metadata as raw-struct
``.cpimg`` dumps (Image::checkpoint, Image.cu:274-303).  Its test suite ships
golden per-stage checkpoints under test/checkpoints/Pipeline{2,3}View; parsing
them gives us the same golden-regression oracle the reference's own gtest
suite uses (test/Pipeline.cu:104-436).

``.uty`` layout (little-endian):
    <typeid name>\\n  <u64 hash>\\n  <i32 MemoryState> <u64 numElements>\\n
    <raw element bytes>

Element layouts (x86-64 / CUDA alignment rules):
    float3                      : 3*f32 (12 B)
    KeyPoint                    : i32 parentId, pad4, 2*f32 loc      (16 B)
    MultiMatch                  : u32 numKeyPoints, i32 index        (8 B)
    Feature<SIFT_Descriptor>    : i32 parent, pad4, 2*f32 loc,
                                  f32 sigma, f32 theta, u8[128]      (152 B)
    unsigned char ('h')         : u8
"""

from __future__ import annotations

import dataclasses
import struct
from typing import Optional

import numpy as np


def _read_uty_header(data: bytes):
    nl1 = data.index(b"\n")
    name = data[:nl1].decode()
    off = nl1 + 1
    (hash_code,) = struct.unpack_from("<Q", data, off)
    off += 8
    assert data[off : off + 1] == b"\n"
    off += 1
    (state,) = struct.unpack_from("<i", data, off)
    off += 4
    (count,) = struct.unpack_from("<Q", data, off)
    off += 8
    assert data[off : off + 1] == b"\n"
    off += 1
    return name, state, count, off


def read_uty(path: str, dtype: np.dtype) -> np.ndarray:
    """Read a .uty checkpoint as a structured/plain numpy array."""
    with open(path, "rb") as f:
        data = f.read()
    name, state, count, off = _read_uty_header(data)
    itemsize = np.dtype(dtype).itemsize
    body = data[off : off + count * itemsize]
    return np.frombuffer(body, dtype=dtype, count=count)


FLOAT3_DT = np.dtype([("x", "<f4"), ("y", "<f4"), ("z", "<f4")])
KEYPOINT_DT = np.dtype({"names": ["parentId", "loc"], "formats": ["<i4", "<2f4"], "offsets": [0, 8], "itemsize": 16})
MULTIMATCH_DT = np.dtype([("numKeyPoints", "<u4"), ("index", "<i4")])
FEATURE_SIFT_DT = np.dtype(
    {
        "names": ["parent", "loc", "sigma", "theta", "values"],
        "formats": ["<i4", "<2f4", "<f4", "<f4", "(128,)u1"],
        "offsets": [0, 8, 16, 20, 24],
        "itemsize": 152,
    }
)


def read_float3(path: str) -> np.ndarray:
    """Read a float3 .uty as (N, 3) float32."""
    a = read_uty(path, FLOAT3_DT)
    return np.stack([a["x"], a["y"], a["z"]], axis=1)


def read_keypoints(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a KeyPoint .uty: returns (parent_ids (N,), locs (N,2))."""
    a = read_uty(path, KEYPOINT_DT)
    return a["parentId"].copy(), a["loc"].copy()


def read_multimatches(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a MultiMatch .uty: returns (numKeyPoints (N,), index (N,))."""
    a = read_uty(path, MULTIMATCH_DT)
    return a["numKeyPoints"].astype(np.int64), a["index"].astype(np.int64)


def read_sift_features(path: str) -> dict:
    """Read a Feature<SIFT_Descriptor> .uty."""
    a = read_uty(path, FEATURE_SIFT_DT)
    return {
        "parent": a["parent"].copy(),
        "loc": a["loc"].copy(),
        "sigma": a["sigma"].copy(),
        "theta": a["theta"].copy(),
        "values": a["values"].copy(),
    }


def read_pixels(path: str, size: tuple[int, int]) -> np.ndarray:
    """Read an unsigned-char pixels .uty as (H, W) uint8 (row-major)."""
    a = read_uty(path, np.uint8)
    h, w = size
    return a.reshape(h, w)


@dataclasses.dataclass
class RefImage:
    """Decoded reference Image .cpimg (struct layout verified empirically
    against the 240-byte fixtures; fields at the offsets written by
    Image::checkpoint's raw-struct dump, Image.cu:274-303)."""

    id: int
    size: tuple[int, int]           # (width, height)
    color_depth: int
    cam_pos: np.ndarray             # (3,) km
    cam_rot: np.ndarray             # (3,) rad
    fov: np.ndarray                 # (2,) rad
    foc: float
    dpix: np.ndarray                # (2,)
    timestamp: int
    ecef_offset: np.ndarray         # (3,) km
    is_pushbroom: bool
    pixels: Optional[np.ndarray] = None  # (H, W) uint8
    # pushbroom camera fields parsed from a params.csv pushbroom row
    # (Image.cu:108-141): projection_center (2,), axis_radius, roll,
    # altitude, foc, fov, gsd, dpix (2,)
    pushbroom: Optional[dict] = None


def read_cpimg(path: str, pixels_dir: Optional[str] = None) -> RefImage:
    with open(path, "rb") as f:
        raw = f.read()
    gi = lambda off: struct.unpack_from("<i", raw, off)[0]
    gI = lambda off: struct.unpack_from("<I", raw, off)[0]
    gf = lambda off: struct.unpack_from("<f", raw, off)[0]
    gq = lambda off: struct.unpack_from("<q", raw, off)[0]
    f3 = lambda off: np.array([gf(off), gf(off + 4), gf(off + 8)], np.float32)
    f2 = lambda off: np.array([gf(off), gf(off + 4)], np.float32)

    img = RefImage(
        id=gi(32),
        size=(gI(40), gI(44)),
        color_depth=gI(48),
        cam_pos=f3(56),
        cam_rot=f3(68),
        fov=f2(80),
        foc=gf(88),
        dpix=f2(96),
        timestamp=gq(104),
        ecef_offset=f3(112),
        is_pushbroom=bool(raw[208]),
    )
    if pixels_dir is not None:
        img.pixels = read_pixels(f"{pixels_dir}/{img.id}_h.uty", (img.size[1], img.size[0]))
    return img


def load_fixture_dir(dirpath: str, num_images: int = 2) -> dict:
    """Load a full Pipeline{2,3}View fixture directory."""
    out: dict = {"images": []}
    for i in range(num_images):
        out["images"].append(
            read_cpimg(f"{dirpath}/{i}_N6ssrlcv5ImageE.cpimg", pixels_dir=f"{dirpath}/pixels")
        )
    out["seed_features"] = read_sift_features(
        f"{dirpath}/-1_N6ssrlcv7FeatureINS_15SIFT_DescriptorEEE.uty"
    )
    for i in (0, 1):
        kp_par, kp_loc = read_keypoints(f"{dirpath}/{i}_N6ssrlcv8KeyPointE.uty")
        mm_num, mm_idx = read_multimatches(f"{dirpath}/{i}_N6ssrlcv10MultiMatchE.uty")
        out[f"keypoints{i}"] = (kp_par, kp_loc)
        out[f"multimatches{i}"] = (mm_num, mm_idx)
    for i in (0, 1, 2):
        p = f"{dirpath}/{i}_6float3.uty"
        try:
            out[f"points{i}"] = read_float3(p)
        except FileNotFoundError:
            pass
    return out
