"""Wave correction: straighten the panorama's horizon by aligning the
camera x-axes' principal plane with gravity (motion_estimators.cpp:604-686).
"""

import numpy as np

__all__ = ["wave_correct"]


def wave_correct(rmats, kind="horiz"):
    """rmats: list of [3,3] rotations (modified copies returned)."""
    if len(rmats) <= 1:
        return rmats
    rmats = [np.asarray(r, dtype=np.float64) for r in rmats]

    moment = np.zeros((3, 3))
    for r in rmats:
        col = r[:, 0:1]
        moment += col @ col.T
    vals, vecs = np.linalg.eigh(moment)  # ascending eigenvalues
    # cv::eigen returns descending; its row(2) = smallest -> our vecs[:,0]
    if kind == "horiz":
        rg1 = vecs[:, 0]
    elif kind == "vert":
        rg1 = vecs[:, 2]
    else:
        raise ValueError(kind)

    img_k = np.zeros(3)
    for r in rmats:
        img_k += r[:, 2]
    rg0 = np.cross(rg1, img_k)
    n = np.linalg.norm(rg0)
    if n <= np.finfo(float).tiny:
        return rmats
    rg0 /= n
    rg2 = np.cross(rg0, rg1)

    conf = 0.0
    if kind == "horiz":
        for r in rmats:
            conf += rg0 @ r[:, 0]
    else:
        for r in rmats:
            conf -= rg1 @ r[:, 0]
    if conf < 0:
        rg0 = -rg0
        rg1 = -rg1

    R = np.stack([rg0, rg1, np.cross(rg0, rg1)])
    return [R @ r for r in rmats]
