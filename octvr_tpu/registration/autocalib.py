"""Focal auto-calibration from pairwise homographies.

Closed-form focal extraction (stitching/src/autocalib.cpp:66-130):
two candidate focal squares per direction from the homography entries,
geometric-mean combination, median across all pairs.
"""

import numpy as np

__all__ = ["focals_from_homography", "estimate_focal"]


def focals_from_homography(H):
    """Returns (f0, f1, f0_ok, f1_ok) — focals of the destination (f0)
    and source (f1) cameras."""
    h = np.asarray(H, dtype=np.float64).reshape(-1)

    f1 = f0 = None
    f1_ok = True
    d1 = h[6] * h[7]
    d2 = (h[7] - h[6]) * (h[7] + h[6])
    v1 = -(h[0] * h[1] + h[3] * h[4]) / d1 if d1 != 0 else -np.inf
    v2 = (
        (h[0] * h[0] + h[3] * h[3] - h[1] * h[1] - h[4] * h[4]) / d2
        if d2 != 0
        else -np.inf
    )
    if v1 < v2:
        v1, v2 = v2, v1
    if v1 > 0 and v2 > 0:
        f1 = np.sqrt(v1 if abs(d1) > abs(d2) else v2)
    elif v1 > 0:
        f1 = np.sqrt(v1)
    else:
        f1_ok = False

    f0_ok = True
    d1 = h[0] * h[3] + h[1] * h[4]
    d2 = h[0] * h[0] + h[1] * h[1] - h[3] * h[3] - h[4] * h[4]
    v1 = -h[2] * h[5] / d1 if d1 != 0 else -np.inf
    v2 = (h[5] * h[5] - h[2] * h[2]) / d2 if d2 != 0 else -np.inf
    if v1 < v2:
        v1, v2 = v2, v1
    if v1 > 0 and v2 > 0:
        f0 = np.sqrt(v1 if abs(d1) > abs(d2) else v2)
    elif v1 > 0:
        f0 = np.sqrt(v1)
    else:
        f0_ok = False

    return f0, f1, f0_ok, f1_ok


def estimate_focal(features, matches):
    """Median focal across all pair homographies (autocalib.cpp:97-130);
    falls back to the size-based guess when too few estimates."""
    n = len(features)
    all_focals = []
    for mi in matches.values():
        if mi.H is None:
            continue
        for H in (mi.H, np.linalg.inv(mi.H)):
            f0, f1, ok0, ok1 = focals_from_homography(H)
            if ok0 and ok1:
                all_focals.append(np.sqrt(f0 * f1))
    if len(all_focals) >= n - 1:
        return [float(np.median(all_focals))] * n
    # naive fallback: f = w + h (autocalib.cpp:133-139 semantics)
    return [
        float(f.img_size[0] + f.img_size[1]) for f in features
    ]
