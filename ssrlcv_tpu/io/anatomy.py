"""Reader for the IPOL "Anatomy of SIFT" reference-implementation output.

Mirror of io_fmt_anatomy (io_fmt_anatomy.cuh:23-30, io_fmt_anatomy.cu):
whitespace-separated text files of keypoints (x y sigma theta + 128 ints) and
matches (x1 y1 s1 t1 x2 y2 s2 t2), used to cross-validate SIFT output against
a published gold standard.
"""

from __future__ import annotations

import io
from typing import TextIO, Union

import numpy as np


def read_features(source: Union[str, TextIO]) -> dict:
    """Parse an Anatomy-of-SIFT keypoint file.

    Returns {'loc' (N,2) f32, 'sigma' (N,), 'theta' (N,), 'values' (N,128) u8}.
    """
    if isinstance(source, str):
        with open(source) as f:
            return read_features(f)
    locs, sigmas, thetas, descs = [], [], [], []
    for line in source:
        parts = line.split()
        if len(parts) < 4 + 128:
            continue
        vals = [float(v) for v in parts]
        locs.append(vals[0:2])
        sigmas.append(vals[2])
        thetas.append(vals[3])
        descs.append([int(v) for v in vals[4 : 4 + 128]])
    return {
        "loc": np.asarray(locs, np.float32).reshape(-1, 2),
        "sigma": np.asarray(sigmas, np.float32),
        "theta": np.asarray(thetas, np.float32),
        "values": np.asarray(descs, np.uint8).reshape(-1, 128),
        "parent": np.full(len(sigmas), -1, np.int32),
    }


def read_matches(source: Union[str, TextIO]) -> dict:
    """Parse an Anatomy-of-SIFT match file.

    Returns {'loc0' (N,2), 'loc1' (N,2), 'sigma0', 'theta0', 'sigma1',
    'theta1'}.
    """
    if isinstance(source, str):
        with open(source) as f:
            return read_matches(f)
    rows = []
    for line in source:
        parts = line.split()
        if len(parts) < 8:
            continue
        rows.append([float(v) for v in parts[:8]])
    a = np.asarray(rows, np.float32).reshape(-1, 8)
    return {
        "loc0": a[:, 0:2],
        "sigma0": a[:, 2],
        "theta0": a[:, 3],
        "loc1": a[:, 4:6],
        "sigma1": a[:, 6],
        "theta1": a[:, 7],
    }
