"""Registration pipeline tests on synthetic data with known ground truth
(BASELINE configs 3 and 4)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from octvr_tpu.registration import (
    CameraParams,
    bundle_adjust_ray,
    detect_and_describe,
    estimate_rotations,
    find_homography_ransac,
    match_images,
    match_pair,
    register_images,
    wave_correct,
)
from octvr_tpu.registration.bundle import inv_rodrigues, rodrigues

PI = math.pi


# ---------------------------------------------------------------- helpers


def world_tex(d):
    """Busy, corner-rich color field over cv-convention ray directions
    [..., 3] -> [..., 3] uint8-range floats."""
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    # random per-cell brightness -> L/T junctions everywhere (FAST does
    # not fire on perfect checkerboard X-corners)
    a = np.floor((np.arctan2(x, z) + PI) * 64 / PI)
    b = np.floor((np.arcsin(np.clip(y, -1, 1)) + PI / 2) * 64 / PI)
    # per-cell pseudo-random brightness with large aperiodic variation so
    # corners are locally unique (repetitive textures defeat matching)
    check = ((a * 7919 + b * 104729 + a * b * 337) % 97) / 96.0 * 170 + 30
    r = check + 35 * np.sin(31 * x + 17 * y) + 30 * np.sin(3.1 * x - 1.7 * z)
    g = check + 35 * np.cos(23 * y + 11 * z) + 30 * np.cos(2.3 * y + 1.1 * x)
    bl = check + 35 * np.sin(27 * z + 19 * x) + 30 * np.sin(2.9 * z + 1.3 * y)
    return np.clip(np.stack([r, g, bl], axis=-1), 0, 255)


def render_view(R_cv, f, w, h):
    """Render a pinhole view (cv convention: ray_world = R @ K^-1 p)."""
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    d_cam = np.stack(
        [(u - w / 2) / f, (v - h / 2) / f, np.ones_like(u)], axis=-1
    )
    d_world = d_cam @ np.asarray(R_cv).T
    return world_tex(d_world).astype(np.float32)


def yaw_cameras(n, step_deg, f=400.0):
    """Cameras rotated about the world y axis."""
    cams = []
    for k in range(n):
        a = math.radians(step_deg * k)
        R = np.array(
            [
                [math.cos(a), 0, math.sin(a)],
                [0, 1, 0],
                [-math.sin(a), 0, math.cos(a)],
            ]
        )
        cams.append(R)
    return cams


# ----------------------------------------------------------------- tests


def test_fast_detects_checker_corners():
    img = render_view(np.eye(3), 400.0, 320, 240)
    gray = np.asarray(
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    feats = detect_and_describe(jnp.asarray(gray), max_features=300)
    valid = np.asarray(feats.valid)
    assert valid.sum() > 100
    kp = np.asarray(feats.keypoints)[valid]
    # keypoints inside the border margin
    assert (kp[:, 0] > 15).all() and (kp[:, 0] < 320 - 15).all()


def test_match_pair_self_identity():
    img = render_view(np.eye(3), 400.0, 320, 240)
    gray = jnp.asarray(
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    f1 = detect_and_describe(gray, max_features=300)
    pairs, valid = match_pair(f1, f1)
    # self-matching links keypoints to themselves
    same = (pairs[:, 0] == pairs[:, 1]).mean()
    assert same > 0.9


def test_ransac_homography_exact():
    rng = np.random.default_rng(0)
    H_true = np.array([[1.1, 0.05, 10.0], [-0.03, 0.95, -6.0], [1e-4, -2e-4, 1.0]])
    src = rng.uniform(-150, 150, (200, 2))
    ones = np.ones((200, 1))
    proj = np.concatenate([src, ones], 1) @ H_true.T
    dst = proj[:, :2] / proj[:, 2:3]
    # 30% outliers
    dst[:60] += rng.uniform(20, 80, (60, 2))
    H, inl = find_homography_ransac(src, dst, seed=1)
    assert H is not None
    assert inl[60:].mean() > 0.95
    np.testing.assert_allclose(H / H[2, 2], H_true / H_true[2, 2], atol=2e-2)


def test_ransac_rejects_rank_deficient_support():
    """A rank-deficient 'homography' maps the plane onto a line, so
    every correspondence consistent with it has collinear dst support —
    chance-level models of exactly this shape escaped RANSAC on the
    unmatchable aero1/aero3 pair (BASELINE round-5 falsification:
    9-12 'inliers', 2nd singular value ~1e-14).  The _spans_2d guard
    must return no model for such support."""
    rng = np.random.default_rng(3)
    src = rng.uniform(0, 400, (60, 2))
    t = src[:, 0] * 0.6 + src[:, 1] * 0.8
    dst = np.stack([10 + 0.5 * t, 200 + 0.25 * t], axis=1)
    dst += rng.normal(0, 0.5, dst.shape)
    H, inl = find_homography_ransac(src, dst, seed=0)
    assert H is None, "rank-1 support must be rejected"


@pytest.fixture(scope="module")
def synthetic_ring():
    f = 380.0
    w, h = 400, 300
    Rs = yaw_cameras(5, 30.0, f)
    images = [render_view(R, f, w, h) for R in Rs]
    return images, Rs, f, (w, h)


def test_full_registration_recovers_geometry(synthetic_ring):
    images, Rs_true, f_true, (w, h) = synthetic_ring
    res = register_images(images, ba="ray", conf_thresh=0.5)
    assert len(res.indices) == 5, f"kept only {res.indices}"
    # focals within 5%
    focs = np.array([c.focal for c in res.cameras])
    assert np.all(np.abs(focs / f_true - 1.0) < 0.05), focs
    # pairwise relative rotations match truth within ~1 degree
    for a in range(4):
        R_rel_est = res.cameras[a + 1].R @ res.cameras[a].R.T
        R_rel_true = Rs_true[a + 1] @ Rs_true[a].T
        dR = R_rel_est @ R_rel_true.T
        ang = math.degrees(
            math.acos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        )
        assert ang < 1.5, f"pair {a}: {ang} deg"
    assert res.rms < 3.0  # ray-space RMS (focal-scaled units ~ px)


def test_bundle_adjust_improves_noisy_rotations(synthetic_ring):
    images, Rs_true, f_true, (w, h) = synthetic_ring
    res = register_images(images, ba=None, wave_kind=None, conf_thresh=0.5)
    # perturb rotations, then BA must pull the reprojection error down
    from octvr_tpu.registration.bundle import BundleData, _ray_residuals

    cams = res.cameras
    rng = np.random.default_rng(3)
    for c in cams[1:]:
        c.R = rodrigues(inv_rodrigues(c.R) + rng.normal(0, 0.01, 3))
    data = BundleData.from_matches(res.features, res.matches, 0.5)
    n = len(cams)
    x0 = np.zeros(n * 4)
    for c_i, cam in enumerate(cams):
        x0[c_i * 4] = cam.focal
        x0[c_i * 4 + 1 : c_i * 4 + 4] = inv_rodrigues(cam.R)
    before = float(np.mean(_ray_residuals(x0, data, n) ** 2))
    cams2, rms = bundle_adjust_ray(res.features, res.matches, cams, 0.5)
    assert rms**2 < before * 0.5


def test_wave_correct_identity_for_level_ring():
    Rs = yaw_cameras(6, 60.0)
    out = wave_correct(Rs, "horiz")
    # a level ring is already wave-corrected: rotations unchanged up to a
    # global rotation about y; the x-axes must stay in the horizontal plane
    for r in out:
        assert abs(r[1, 0]) < 1e-6


def test_cameras_to_rig_roundtrip(synthetic_ring):
    """The exported rig must make the engine's pinhole camera reproduce
    the cv-convention projection of each registered camera."""
    images, Rs_true, f_true, (w, h) = synthetic_ring
    from octvr_tpu.cameras import new_camera
    from octvr_tpu.registration import cameras_to_rig
    from octvr_tpu.registration.stitcher import _C

    res = register_images(images, ba="ray", conf_thresh=0.5)
    rig = cameras_to_rig(res, [(w, h)] * len(res.cameras))
    for cam, spec in zip(res.cameras, rig["inputs"]):
        eng = new_camera(spec["type"], spec["options"])
        rng = np.random.default_rng(5)
        p = rng.uniform([50, 50], [w - 50, h - 50], (50, 2))
        # cv ray for pixel p
        K = cam.K()
        K[0, 2] += 0.5 * w
        K[1, 2] += 0.5 * h
        d_cam = np.concatenate([p, np.ones((50, 1))], 1) @ np.linalg.inv(K).T
        d_world = d_cam @ np.asarray(cam.R).T
        # engine lonlat of the same world direction (world identified via C)
        d_s = d_world @ _C.T
        from octvr_tpu.geometry import xyz_to_lonlat

        ll = xyz_to_lonlat(d_s)
        q = eng.obj_to_image(ll)  # engine y_norm == v_cv/h (see stitcher._C)
        qx = q[:, 0] * w
        qy = q[:, 1] * h
        np.testing.assert_allclose(
            np.stack([qx, qy], 1), p, atol=0.1
        )


def test_full_loop_ring_to_panorama():
    """Config-3 integration: register a 9-camera yaw ring, export the rig,
    compile a template, stitch, and verify against the true world up to
    the global-yaw gauge freedom."""
    from octvr_tpu.geometry import lonlat_to_xyz
    from octvr_tpu.cameras import new_camera
    from octvr_tpu.registration import cameras_to_rig
    from octvr_tpu.registration.stitcher import _C
    from octvr_tpu.template import compile_rig
    from octvr_tpu.template.compiler import _remap_image_cpu

    f = 380.0
    w, h = 400, 300
    Rs = yaw_cameras(9, 40.0, f)
    imgs = [render_view(R, f, w, h) for R in Rs]
    res = register_images(imgs, ba="ray", conf_thresh=0.5)
    assert len(res.indices) == 9
    focs = np.array([c.focal for c in res.cameras])
    assert np.all(np.abs(focs / f - 1.0) < 0.02), focs
    assert res.rms < 2.0

    rig = cameras_to_rig(res, [(w, h)] * 9)
    mt = compile_rig(rig, 512, 256)
    mt.create_masks()
    W, H = mt.out_size
    canvas = np.zeros((H, W, 3), np.uint8)
    for inp, sm, idx in zip(mt.inputs, mt.seam_masks, res.indices):
        x, y, rw, rh = inp.roi
        warped = _remap_image_cpu(imgs[idx].astype(np.uint8), inp.map1, inp.map2)
        sel = sm > 128
        canvas[y : y + rh, x : x + rw][sel] = warped[sel]

    xs = np.arange(W) / W
    ys = np.arange(H) / H
    ll = new_camera("equirectangular", {}).image_to_obj(
        np.stack(np.meshgrid(xs, ys), -1)
    )
    truth = world_tex(lonlat_to_xyz(ll) @ _C.T)
    covered = canvas.sum(-1) > 0
    # equatorial band coverage (yaw ring sees ~ +-21 deg of latitude)
    assert 0.15 < covered.mean() < 0.35

    # registration has a free global yaw: search the best circular shift
    best = np.inf
    for shift in range(W):
        rolled = np.roll(canvas, shift, axis=1)
        rc = np.roll(covered, shift, axis=1)
        err = np.abs(rolled.astype(float) - truth)[rc].mean()
        best = min(best, err)
    assert best < 20.0, f"best aligned err {best}"


def test_jax_bundle_adjust_matches_numpy(synthetic_ring):
    """Analytic-Jacobian (jacfwd) BA agrees with the f64 numeric path."""
    images, Rs_true, f_true, (w, h) = synthetic_ring
    from octvr_tpu.registration.bundle_jax import bundle_adjust_ray_jax

    res = register_images(images, ba=None, wave_kind=None, conf_thresh=0.5)
    import copy

    cams_np, rms_np = bundle_adjust_ray(
        res.features, res.matches, copy.deepcopy(res.cameras), 0.5
    )
    cams_jx, rms_jx = bundle_adjust_ray_jax(
        res.features, res.matches, copy.deepcopy(res.cameras), 0.5
    )
    f_np = np.array([c.focal for c in cams_np])
    f_jx = np.array([c.focal for c in cams_jx])
    np.testing.assert_allclose(f_jx, f_np, rtol=0.02)  # f32 vs f64 LM
    assert rms_jx < rms_np * 1.5 + 0.1


def test_sharded_bundle_adjust(synthetic_ring):
    """The match-sharded psum reduction gives the same solution on an
    8-device mesh (SURVEY §2.5: distributed BA reduction)."""
    import jax
    from jax.sharding import Mesh

    images, Rs_true, f_true, (w, h) = synthetic_ring
    from octvr_tpu.registration.bundle_jax import bundle_adjust_ray_jax
    import copy

    res = register_images(images, ba=None, wave_kind=None, conf_thresh=0.5)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(8), axis_names=("data",))
    cams_sh, rms_sh = bundle_adjust_ray_jax(
        res.features, res.matches, copy.deepcopy(res.cameras), 0.5, mesh=mesh
    )
    cams_1, rms_1 = bundle_adjust_ray_jax(
        res.features, res.matches, copy.deepcopy(res.cameras), 0.5
    )
    f_sh = np.array([c.focal for c in cams_sh])
    f_1 = np.array([c.focal for c in cams_1])
    np.testing.assert_allclose(f_sh, f_1, rtol=0.01)
    assert abs(rms_sh - rms_1) < 0.1


def test_range_matcher_limits_pairs(synthetic_ring):
    """BestOf2NearestRangeMatcher semantics (matchers.cpp:667-695): only
    ordered neighbors within range_width are matched."""
    images, Rs_true, f_true, (w, h) = synthetic_ring
    grays = [
        jnp.asarray(
            0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]
        )
        for im in images
    ]
    feats = [detect_and_describe(g, max_features=300) for g in grays]
    m_all = match_images(feats)
    m_rng = match_images(feats, range_width=2)
    assert set(m_all.keys()) == {
        (i, j) for i in range(5) for j in range(i + 1, 5)
    }
    assert set(m_rng.keys()) == {(i, i + 1) for i in range(4)}
    # adjacent-pair results identical to the full fan-out
    for k in m_rng:
        assert m_rng[k].num_inliers == m_all[k].num_inliers


def test_pyramid_detector_multiscale():
    """detect_and_describe_pyramid matches across a 2x scale change where
    the single-scale detector's descriptors do not."""
    from octvr_tpu.registration.features import detect_and_describe_pyramid
    from octvr_tpu.registration.matchers import match_pair

    img1 = render_view(np.eye(3), 300.0, 400, 300)  # wide
    img2 = render_view(np.eye(3), 600.0, 400, 300)  # 2x zoom, same center

    def gray(im):
        return np.asarray(
            0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]
        )

    f1 = detect_and_describe_pyramid(gray(img1), max_features=600, levels=4)
    f2 = detect_and_describe_pyramid(gray(img2), max_features=600, levels=4)
    pairs, _ = match_pair(f1, f2)
    src = np.asarray(f1.keypoints)[pairs[:, 0]] - [200, 150]
    dst = np.asarray(f2.keypoints)[pairs[:, 1]] - [200, 150]
    H, inl = find_homography_ransac(src, dst, seed=2)
    assert H is not None and inl.sum() >= 12, (
        None if H is None else inl.sum()
    )
    # the true map is a pure 2x scale about the center
    s = (H[0, 0] + H[1, 1]) / 2 / H[2, 2]
    assert abs(s - 2.0) < 0.15, s


def test_registration_12cam_two_focal_scales():
    """VERDICT r1 item 7: 12+ cameras at two focal scales register with
    the multi-scale detector."""
    f_wide, f_tele = 320.0, 560.0
    w, h = 400, 300
    Rs = yaw_cameras(12, 30.0)
    focals = [f_wide if k % 2 == 0 else f_tele for k in range(12)]
    images = [render_view(R, f, w, h) for R, f in zip(Rs, focals)]

    from octvr_tpu.registration import register_images

    res = register_images(
        images, ba="ray", conf_thresh=0.5, max_features=900, levels=3
    )
    assert len(res.indices) >= 11, res.indices
    focs = np.array([c.focal for c in res.cameras])
    true = np.array([focals[i] for i in res.indices])
    rel = np.abs(focs / true - 1.0)
    assert np.all(rel < 0.08), (focs, true)
    # relative rotations of surviving neighbors within ~2 degrees
    for a in range(len(res.indices) - 1):
        ia, ib = res.indices[a], res.indices[a + 1]
        R_rel_est = res.cameras[a + 1].R @ res.cameras[a].R.T
        R_rel_true = Rs[ib] @ Rs[ia].T
        dR = R_rel_est @ R_rel_true.T
        ang = math.degrees(math.acos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 2.0, f"pair {ia}-{ib}: {ang} deg"


def test_schur_block_ba_rms_parity_9cam():
    """VERDICT r1 item 8: camera-block jitted LM matches the f64 numeric
    CvLevMarq-parity path on a 9-cam ring to |d RMS| < 1e-3."""
    import copy

    from octvr_tpu.registration.bundle_jax import bundle_adjust_ray_jax

    Rs = yaw_cameras(9, 40.0)
    images = [render_view(R, 380.0, 400, 300) for R in Rs]
    res = register_images(images, ba=None, wave_kind=None, conf_thresh=0.5)
    cams_np, rms_np = bundle_adjust_ray(
        res.features, res.matches, copy.deepcopy(res.cameras), 0.5
    )
    cams_jx, rms_jx = bundle_adjust_ray_jax(
        res.features, res.matches, copy.deepcopy(res.cameras), 0.5
    )
    assert abs(rms_np - rms_jx) < 1e-3, (rms_np, rms_jx)
    np.testing.assert_allclose(
        [c.focal for c in cams_jx], [c.focal for c in cams_np], rtol=1e-3
    )


def test_calibrate_rotating_camera():
    """Linear self-calibration (autocalib.cpp:146-194) recovers K exactly
    from noise-free H = K R K^-1."""
    from octvr_tpu.registration.autocalib import calibrate_rotating_camera
    from octvr_tpu.registration.bundle import rodrigues

    rng = np.random.default_rng(1)
    K_true = np.array([[500.0, 0, 320], [0, 480, 240], [0, 0, 1]])
    Hs = [
        K_true @ rodrigues(rng.uniform(-0.4, 0.4, 3)) @ np.linalg.inv(K_true)
        for _ in range(6)
    ]
    K = calibrate_rotating_camera(Hs)
    np.testing.assert_allclose(K, K_true, atol=0.5)
