"""Registration on REAL photographs (VERDICT r4 next #4).

Every other registration test runs on synthetic rigs and rendered
worlds; this one exercises the full features -> 2-NN match -> RANSAC
pipeline (the BestOf2NearestMatcher role, matchers.cpp:581-658) on the
reference's own viewpoint-change fixture: graf1 -> graf3 with the
checked-in ground-truth homography
(/root/reference/samples/data/H1to3p.xml)."""

import os

import numpy as np
import pytest

import jax

from octvr_tpu.registration.features import detect_and_describe_pyramid
from octvr_tpu.registration.matchers import (
    find_homography_ransac,
    match_pair,
)
from octvr_tpu.utils.png import read_png

DATA = "/root/reference/samples/data"

# H13 from H1to3p.xml: maps graf1 pixel coords to graf3 pixel coords
H_GT = np.array(
    [
        [7.6285898e-01, -2.9922929e-01, 2.2567123e02],
        [3.3443473e-01, 1.0143901e00, -7.6999973e01],
        [3.4663091e-04, -1.4364524e-05, 1.0],
    ]
)

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA, "graf1.png")),
    reason="reference sample data not present",
)


def _gray(im):
    im = im.astype(np.float32)
    return 0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]


def _down2(a):
    return (
        a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2]
    ) * 0.25


def _project(M, pts):
    q = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ M.T
    return q[:, :2] / q[:, 2:3]


def test_graf_homography_vs_ground_truth():
    """Recover the graf1->graf3 homography from real image statistics
    and assert the corner-transfer error against the checked-in ground
    truth.  Run at half scale (400x320) for speed; H scales as
    S H S^-1.  Measured: 50+ inliers, max corner error < 2 px at half
    scale (< 4 px full-res) — ORB-class accuracy on the standard
    viewpoint-change benchmark pair."""
    g1 = read_png(os.path.join(DATA, "graf1.png")).astype(np.float32)
    g3 = read_png(os.path.join(DATA, "graf3.png")).astype(np.float32)
    assert g1.shape == (640, 800, 3)

    d1 = _down2(_gray(g1))
    d3 = _down2(_gray(g3))
    f1 = detect_and_describe_pyramid(
        d1, max_features=1200, levels=3, grid=(4, 3)
    )
    f3 = detect_and_describe_pyramid(
        d3, max_features=1200, levels=3, grid=(4, 3)
    )
    pairs, _ = match_pair(f1, f3)
    assert len(pairs) >= 30, len(pairs)
    src = np.asarray(f1.keypoints)[pairs[:, 0]]
    dst = np.asarray(f3.keypoints)[pairs[:, 1]]
    H, inl = find_homography_ransac(src, dst, seed=0)
    assert H is not None and int(inl.sum()) >= 25, (
        None if H is None else int(inl.sum())
    )

    S = np.diag([0.5, 0.5, 1.0])
    H_gt2 = S @ H_GT @ np.linalg.inv(S)
    corners = np.array(
        [[0, 0], [399, 0], [0, 319], [399, 319]], dtype=float
    )
    err = np.linalg.norm(
        _project(H / H[2, 2], corners) - _project(H_gt2, corners), axis=1
    )
    # measured 1.86 max; allow real slack without letting a wrong model
    # pass (a mismatched H puts corners tens of px off)
    assert err.max() < 5.0, err
    assert err.mean() < 3.0, err
