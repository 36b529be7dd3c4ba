"""SURF-role blob finder (registration/blobs.py) on low-texture content.

The reference registers with SURF by default (matchers.cpp:365-389): a
Hessian blob detector whose value shows on rigs where corners are sparse
(sky, walls, defocus).  The fixture here is exactly that — a smooth
Gaussian-blob field with NO sharp corners — and the acceptance criterion
is the VERDICT one: the blob finder recovers the geometry where the
FAST-corner finder finds (nearly) nothing."""

import numpy as np
import pytest

import jax.numpy as jnp

from octvr_tpu.registration import (
    detect_and_describe,
    detect_and_describe_blobs,
    find_homography_ransac,
    match_pair,
)


def blob_field(w=480, h=360, n=45, seed=3):
    """Smooth field of broad Gaussian blobs.  Blob sigma >= 7 keeps the
    center-to-ring-3 contrast a*(1-exp(-9/(2s^2))) < 10 < the FAST
    threshold (12), so FAST-9 stays silent — while the scale-normalized
    determinant of Hessian responds strongly."""
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 90.0 + 30.0 * (xx / w)  # gentle background ramp
    for _ in range(n):
        cx = rng.uniform(25, w - 25)
        cy = rng.uniform(25, h - 25)
        s = rng.uniform(7.0, 14.0)
        a = rng.uniform(50.0, 110.0) * rng.choice([-1.0, 1.0])
        img = img + a * np.exp(
            -((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * s * s)
        )
    return np.clip(img, 0, 255).astype(np.float32)


@pytest.fixture(scope="module")
def views():
    big = blob_field()
    tx, ty = 23, 11
    a = big[: 300, : 400]
    b = big[ty : ty + 300, tx : tx + 400]
    return a, b, tx, ty


def test_fast_finds_nothing_on_blobs(views):
    a, b, _, _ = views
    fa = detect_and_describe(jnp.asarray(a), max_features=500)
    fb = detect_and_describe(jnp.asarray(b), max_features=500)
    # smooth content: FAST-9 never fires (this is the failure mode the
    # blob finder exists to cover)
    n_valid = int(np.asarray(fa.valid).sum()) + int(np.asarray(fb.valid).sum())
    assert n_valid <= 4, f"FAST unexpectedly fired {n_valid} corners"
    pairs, _ = match_pair(fa, fb)
    assert len(pairs) <= 4


def test_blobs_recover_translation(views):
    a, b, tx, ty = views
    fa = detect_and_describe_blobs(jnp.asarray(a), max_features=400)
    fb = detect_and_describe_blobs(jnp.asarray(b), max_features=400)
    assert int(np.asarray(fa.valid).sum()) >= 25  # blobs ARE detected

    pairs, _ = match_pair(fa, fb)
    assert len(pairs) >= 20, f"only {len(pairs)} blob matches"

    src = np.asarray(fa.keypoints)[pairs[:, 0]]
    dst = np.asarray(fb.keypoints)[pairs[:, 1]]
    H, inl = find_homography_ransac(src, dst, seed=7)
    assert H is not None and int(inl.sum()) >= 15
    H = H / H[2, 2]
    # pure translation between the crops: dst = src - (tx, ty)
    assert abs(H[0, 2] + tx) < 2.0, H
    assert abs(H[1, 2] + ty) < 2.0, H
    # inliers agree pointwise
    d = dst[inl] - src[inl]
    assert np.abs(d[:, 0] + tx).mean() < 1.5
    assert np.abs(d[:, 1] + ty).mean() < 1.5


def sphere_blob_tex(d, seed=11, n=220):
    """Low-texture world: broad Gaussian bumps on the sphere (defocused
    sky/wall analogue).  d: [..., 3] unit rays -> [..., 3] float colors."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(n, 3))
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    s = rng.uniform(0.05, 0.12, n).astype(np.float32)  # angular width
    a = rng.uniform(40.0, 90.0, n) * rng.choice([-1.0, 1.0], n)
    base = np.full(d.shape[:-1], 110.0, dtype=np.float32)
    val = base.copy()
    flat = d.reshape(-1, 3)
    acc = np.zeros(flat.shape[0], dtype=np.float32)
    for k in range(n):
        dot = flat @ c[k]
        acc += a[k] * np.exp((dot - 1.0) / (s[k] * s[k]))
    val = (base.reshape(-1) + acc).reshape(d.shape[:-1])
    val = np.clip(val, 0, 255)
    return np.stack([val, val, val], axis=-1)


def render_lowtex_view(R_cv, f, w, h):
    xs = np.arange(w) + 0.5 - w / 2
    ys = np.arange(h) + 0.5 - h / 2
    xx, yy = np.meshgrid(xs, ys)
    rays = np.stack([xx / f, yy / f, np.ones_like(xx)], axis=-1)
    rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
    world = rays @ R_cv.T
    return sphere_blob_tex(world).astype(np.float32)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def test_blob_registration_beats_fast():
    """The VERDICT item-5 criterion: on a low-texture rig the blob
    finder registers successfully where FAST-only fails or degrades
    (the SurfFeaturesFinder role, matchers.cpp:365-389)."""
    from octvr_tpu.registration import register_images

    f, w, h = 400.0, 640, 480
    yaw = np.deg2rad(25.0)
    images = [
        render_lowtex_view(np.eye(3), f, w, h),
        render_lowtex_view(_rot_y(yaw), f, w, h),
    ]

    res = register_images(
        images, finder="blob", ba="ray", conf_thresh=0.5, wave_kind=None
    )
    assert len(res.indices) == 2, "blob finder must keep both views"
    R_rel = res.cameras[1].R @ res.cameras[0].R.T
    ang = np.degrees(
        np.arccos(np.clip((np.trace(R_rel) - 1) / 2, -1, 1))
    )
    assert abs(ang - 25.0) < 2.0, f"blob yaw {ang} deg"

    # FAST on the same views: no corners -> registration degrades
    try:
        res_f = register_images(
            images, finder="fast", ba="ray", conf_thresh=0.5, wave_kind=None
        )
        degraded = len(res_f.indices) < 2
        if not degraded:
            R_rel = res_f.cameras[1].R @ res_f.cameras[0].R.T
            angf = np.degrees(
                np.arccos(np.clip((np.trace(R_rel) - 1) / 2, -1, 1))
            )
            degraded = abs(angf - 25.0) > 5.0
    except Exception:
        degraded = True
    assert degraded, "FAST unexpectedly registered the low-texture rig"


def test_blobs_rotation_tolerance(views):
    """Orientation assignment: matches survive a 10-degree in-plane
    rotation (the SURF dominant-orientation role)."""
    from scipy.ndimage import rotate

    a, _, _, _ = views
    b = rotate(a, angle=10.0, reshape=False, order=1, mode="nearest")
    fa = detect_and_describe_blobs(jnp.asarray(a), max_features=400)
    fb = detect_and_describe_blobs(jnp.asarray(b.astype(np.float32)),
                                   max_features=400)
    pairs, _ = match_pair(fa, fb)
    assert len(pairs) >= 12, f"only {len(pairs)} matches under rotation"
    src = np.asarray(fa.keypoints)[pairs[:, 0]]
    dst = np.asarray(fb.keypoints)[pairs[:, 1]]
    H, inl = find_homography_ransac(src, dst, seed=7)
    assert H is not None and int(inl.sum()) >= 8
    # rotation center = image center; check the recovered angle
    ang = np.arctan2(H[1, 0], H[0, 0]) * 180 / np.pi
    assert abs(abs(ang) - 10.0) < 3.0, ang
