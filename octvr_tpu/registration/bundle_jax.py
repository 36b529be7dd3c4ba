"""JAX bundle adjustment: analytic Jacobians via jacfwd and a
multi-device Schur-style normal-equation reduction.

The NumPy path (bundle.py) mirrors the reference's numeric-difference
CvLevMarq in f64 for parity; this path is the scale-out design from
SURVEY.md §7: residuals are pure jnp (differentiable), J comes from
jax.jacfwd instead of 2*P residual re-evaluations
(motion_estimators.cpp:579-601), and for large rigs the J^T J / J^T r
accumulation shards the *match* axis over a device mesh with psum —
each device holds a slice of the correspondences, the [P, P] normal
matrix is tiny and replicated.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bundle import BundleData, inv_rodrigues, rodrigues

__all__ = ["bundle_adjust_ray_jax"]


def _rodrigues_jnp(rvec):
    theta = jnp.sqrt(jnp.sum(rvec * rvec) + 1e-12)
    k = rvec / theta
    kx, ky, kz = k[0], k[1], k[2]
    K = jnp.array([[0.0, -kz, ky], [kz, 0.0, -kx], [-ky, kx, 0.0]])
    return (
        jnp.eye(3) + jnp.sin(theta) * K + (1.0 - jnp.cos(theta)) * (K @ K)
    )


def _ray_residuals_jnp(params, cam_i, cam_j, p1, p2, sizes, n):
    P = params.reshape(n, 4)
    f = P[:, 0]
    Rs = jnp.stack([_rodrigues_jnp(P[c, 1:4]) for c in range(n)])
    cx = sizes[:, 0] * 0.5
    cy = sizes[:, 1] * 0.5

    def rays(ci, pts):
        fc = f[ci]
        x = (pts[:, 0] - cx[ci]) / fc
        y = (pts[:, 1] - cy[ci]) / fc
        v = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
        w = jnp.einsum("mij,mj->mi", Rs[ci], v)
        return w / jnp.linalg.norm(w, axis=-1, keepdims=True)

    r1 = rays(cam_i, p1)
    r2 = rays(cam_j, p2)
    mult = jnp.sqrt(jnp.abs(f[cam_i] * f[cam_j]))
    return ((r1 - r2) * mult[:, None]).reshape(-1)


def _make_normal_fn(n, mesh=None):
    """Returns jitted fn(params, data arrays) -> (JtJ, Jtr, cost).  With a
    mesh, matches are sharded over its first axis and the reductions are
    psum'd."""

    def normal(params, cam_i, cam_j, p1, p2, sizes):
        def res_fn(p):
            return _ray_residuals_jnp(p, cam_i, cam_j, p1, p2, sizes, n)

        r = res_fn(params)
        J = jax.jacfwd(res_fn)(params)  # [3m, 4n] analytic
        JtJ = J.T @ J
        Jtr = J.T @ r
        cost = r @ r
        return JtJ, Jtr, cost

    if mesh is None:
        return jax.jit(normal)

    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def sharded(params, cam_i, cam_j, p1, p2, sizes):
        JtJ, Jtr, cost = normal(params, cam_i, cam_j, p1, p2, sizes)
        return (
            jax.lax.psum(JtJ, axis),
            jax.lax.psum(Jtr, axis),
            jax.lax.psum(cost, axis),
        )

    return jax.jit(sharded)


def bundle_adjust_ray_jax(
    features, matches, cameras, conf_thresh=1.0, max_iter=40, mesh=None
):
    """Drop-in alternative to bundle_adjust_ray: analytic-Jacobian LM on
    device; pass a Mesh to shard the correspondence reduction."""
    n = len(cameras)
    data = BundleData.from_matches(features, matches, conf_thresh)
    m = len(data.cam_i)
    if m == 0:
        return cameras, float("nan")

    pad = m
    if mesh is not None:
        dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        pad = -(-m // dev) * dev
    cam_i = np.zeros(pad, np.int32)
    cam_j = np.zeros(pad, np.int32)
    p1 = np.zeros((pad, 2), np.float32)
    p2 = np.zeros((pad, 2), np.float32)
    cam_i[:m] = data.cam_i
    cam_j[:m] = data.cam_j
    p1[:m] = data.p1
    p2[:m] = data.p2
    # padding rows reference camera 0 with its own principal point ->
    # residual 0?  Not exactly; zero them by pointing both ends at the
    # same camera and the same pixel.
    if pad > m:
        cam_j[m:] = cam_i[m:]
        p2[m:] = p1[m:]
    sizes = jnp.asarray(data.sizes, dtype=jnp.float32)

    normal_fn = _make_normal_fn(n, mesh)

    x = np.zeros(n * 4, dtype=np.float64)
    for c, cam in enumerate(cameras):
        x[c * 4] = cam.focal
        x[c * 4 + 1 : c * 4 + 4] = inv_rodrigues(cam.R)

    # phase 1 locks focals (see bundle.py on the ray-cost collapse)
    free_masks = [np.ones(n * 4, bool), np.ones(n * 4, bool)]
    free_masks[0][0::4] = False

    args = (
        jnp.asarray(cam_i),
        jnp.asarray(cam_j),
        jnp.asarray(p1),
        jnp.asarray(p2),
        sizes,
    )

    lam = 1e-3
    cost = None
    for free in free_masks:
        idx = np.flatnonzero(free)
        for _ in range(max_iter):
            JtJ, Jtr, cost_now = (
                np.asarray(v, dtype=np.float64)
                for v in normal_fn(jnp.asarray(x, dtype=jnp.float32), *args)
            )
            cost = float(cost_now)
            A = JtJ[np.ix_(idx, idx)]
            g = Jtr[idx]
            improved = False
            for _ in range(8):
                try:
                    delta = np.linalg.solve(
                        A + lam * np.diag(np.diag(A) + 1e-9), -g
                    )
                except np.linalg.LinAlgError:
                    lam *= 10
                    continue
                xn = x.copy()
                xn[idx] += delta
                _, _, cn = normal_fn(jnp.asarray(xn, dtype=jnp.float32), *args)
                cn = float(cn)
                if cn < cost:
                    x, cost = xn, cn
                    lam = max(lam * 0.1, 1e-10)
                    improved = True
                    break
                lam *= 10
            if not improved:
                break

    for c, cam in enumerate(cameras):
        cam.focal = float(x[c * 4])
        cam.R = rodrigues(x[c * 4 + 1 : c * 4 + 4])
    from .bundle import _center_normalize

    _center_normalize(cameras, matches, n)
    return cameras, float(np.sqrt(cost / m))
