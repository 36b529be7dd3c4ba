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


def estimate_focal(features, matches, min_conf=0.9):
    """Initial focals from pair homographies (autocalib.cpp:97-130).

    Deviates from the reference in two ways that strictly improve mixed
    rigs (the reference applies ONE global median to every camera, which
    collapses two-focal-group rigs, and it includes low-confidence junk
    homographies in the median):

    * only pairs with confidence >= min_conf contribute;
    * each camera gets the median of the estimates for ITS side of each
      homography (f0 = destination, f1 = source), falling back to the
      global median where a camera has no estimate of its own.
    """
    n = len(features)
    all_focals = []
    per_img = [[] for _ in range(n)]
    for (i, j), mi in matches.items():
        if mi.H is None or mi.confidence < min_conf:
            continue
        # mi.H maps image i -> image j: f0 pairs with the source i, f1
        # with the destination j (verified on a synthetic two-focal rig)
        for H, (a, b) in ((mi.H, (i, j)), (np.linalg.inv(mi.H), (j, i))):
            f0, f1, ok0, ok1 = focals_from_homography(H)
            if ok0 and ok1:
                all_focals.append(np.sqrt(f0 * f1))
                per_img[a].append(f0)
                per_img[b].append(f1)
    if len(all_focals) >= max(1, n - 1):
        gmed = float(np.median(all_focals))
        return [
            float(np.median(per_img[i])) if per_img[i] else gmed
            for i in range(n)
        ]
    # naive fallback: f = w + h (autocalib.cpp:133-139 semantics)
    return [
        float(f.img_size[0] + f.img_size[1]) for f in features
    ]


def calibrate_rotating_camera(Hs):
    """Linear self-calibration of a rotating camera from inter-view
    homographies (autocalib.cpp:146-194): det-normalize each H, solve the
    homogeneous system H W H^T = W for the symmetric W = K K^T by SVD
    null-vector, Cholesky-factor W.  Returns the upper-triangular K
    (f64 [3,3]) or None when W is not positive definite."""
    Hs = [np.asarray(H, dtype=np.float64) for H in Hs]
    m = len(Hs)
    assert m >= 1
    Hn = [H / np.cbrt(np.linalg.det(H)) for H in Hs]

    idx_map = [[0, 1, 2], [1, 3, 4], [2, 4, 5]]
    A = np.zeros((6 * m, 6))
    eq = 0
    for H in Hn:
        for i in range(3):
            for j in range(i, 3):
                for l in range(3):
                    for s in range(3):
                        A[eq, idx_map[l][s]] += H[i, l] * H[j, s]
                A[eq, idx_map[i][j]] -= 1.0
                eq += 1

    _, _, vt = np.linalg.svd(A)
    wcoef = vt[-1]
    W = np.empty((3, 3))
    for i in range(3):
        for j in range(i, 3):
            W[i, j] = W[j, i] = wcoef[idx_map[i][j]] / wcoef[5]
    # upper-triangular K with K K^T = W (numpy's cholesky is the lower
    # L L^T factor; flipping about the antidiagonal converts)
    try:
        L = np.linalg.cholesky(W[::-1, ::-1])
    except np.linalg.LinAlgError:
        return None
    K = L[::-1, ::-1]
    K = K / K[2, 2]
    if K[0, 0] < 0:
        K = -K
    return K
