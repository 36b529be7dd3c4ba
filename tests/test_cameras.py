"""Camera model tests: analytic round trips, known-point checks, and
numpy/jax agreement."""

import math

import numpy as np
import pytest

from octvr_tpu.cameras import REGISTRY, new_camera
from octvr_tpu.geometry import (
    lonlat_to_xyz,
    rotation_matrix_from_rpy,
    xyz_to_lonlat,
)

PI = math.pi


def rand_lonlat(n, rng, lat_max=PI / 2 * 0.95):
    lon = rng.uniform(-PI * 0.999, PI * 0.999, n)
    lat = rng.uniform(-lat_max, lat_max, n)
    return np.stack([lon, lat], axis=-1)


def test_lonlat_xyz_roundtrip():
    rng = np.random.default_rng(0)
    ll = rand_lonlat(1000, rng)
    back = xyz_to_lonlat(lonlat_to_xyz(ll))
    np.testing.assert_allclose(back, ll, atol=1e-12)


def test_lonlat_xyz_conventions():
    # (1,0,0) -> (0,0); (0,1,0) -> lat pi/2; (0,0,1) -> lon -pi/2
    np.testing.assert_allclose(
        xyz_to_lonlat(np.array([1.0, 0, 0])), [0, 0], atol=1e-12
    )
    assert xyz_to_lonlat(np.array([0.0, 1, 0]))[1] == pytest.approx(PI / 2)
    np.testing.assert_allclose(
        xyz_to_lonlat(np.array([0.0, 0, 1])), [-PI / 2, 0], atol=1e-12
    )


def test_rotation_identity_and_inverse():
    r = rotation_matrix_from_rpy(0.3, -0.2, 0.7)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(r) == pytest.approx(1.0)


CAMS = {
    "equirectangular": {},
    "stupidoval": {},
    "cubic": {},
    "eqareanorthpole": {},
    "eqareasouthpole": {},
    "normal": {"aspect_ratio": 16 / 9, "cam_opt": 0.7},
    "perspective": {"aspect_ratio": 16 / 9, "sf": 2.0},
    "fullframe_fisheye": {
        "width": 1920,
        "height": 1440,
        "hfov": PI,
        "center_dx": 3.0,
        "center_dy": -2.0,
        "radial": [0.01, -0.02, 0.03],
    },
}


@pytest.mark.parametrize("cam_type", sorted(CAMS))
def test_image_obj_roundtrip(cam_type):
    """image -> sphere -> image must be identity where defined."""
    cam = new_camera(cam_type, CAMS[cam_type])
    rng = np.random.default_rng(1)
    xy = rng.uniform(0.05, 0.95, (2000, 2))
    ll = cam.image_to_obj(xy)
    back = cam.obj_to_image(ll)
    ok = np.isfinite(back).all(axis=-1)
    # every model covers most of its own image (the oval projection only
    # fills ~pi/4 of its rectangle)
    min_cover = 0.7 if cam_type == "stupidoval" else 0.8
    assert ok.mean() > min_cover, f"{cam_type}: only {ok.mean():.2f} finite"
    err = np.abs(back[ok] - xy[ok]).max()
    assert err < 1e-6, f"{cam_type}: roundtrip err {err}"


@pytest.mark.parametrize("cam_type", sorted(CAMS))
def test_obj_image_roundtrip_with_rotation(cam_type):
    opts = dict(CAMS[cam_type])
    opts["rotation"] = {"roll": 0.2, "yaw": -0.5, "pitch": 0.1}
    cam = new_camera(cam_type, opts)
    rng = np.random.default_rng(2)
    xy = rng.uniform(0.05, 0.95, (500, 2))
    ll = cam.image_to_obj(xy)
    back = cam.obj_to_image(ll)
    ok = np.isfinite(back).all(axis=-1)
    assert ok.mean() > 0.7
    np.testing.assert_allclose(back[ok], xy[ok], atol=1e-6)


def test_equirect_analytic():
    cam = new_camera("equirectangular", {})
    ll = cam.image_to_obj(np.array([[0.5, 0.5], [0.0, 0.0], [0.25, 0.75]]))
    np.testing.assert_allclose(ll[0], [0, 0], atol=1e-12)
    np.testing.assert_allclose(ll[1], [-PI, PI / 2], atol=1e-12)
    np.testing.assert_allclose(ll[2], [-PI / 2, -PI / 4], atol=1e-12)


def test_pinhole_center_projection():
    opts = {
        "fx": 1000.0,
        "fy": 1000.0,
        "cx": 960.0,
        "cy": 540.0,
        "dist_coeffs": [0, 0, 0, 0],
        "width": 1920,
        "height": 1080,
    }
    cam = new_camera("pinhole", opts)
    # pinhole looks along +z which is lon=-pi/2 on the sphere
    p = cam.obj_to_image(np.array([[-PI / 2, 0.0]]))
    np.testing.assert_allclose(p[0], [960 / 1920, 1 - 540 / 1080], atol=1e-9)
    # behind the camera -> NaN
    p2 = cam.obj_to_image(np.array([[PI / 2, 0.0]]))
    assert np.isnan(p2).all()


def test_fisheye_vs_pinhole_at_center():
    opts = {
        "fx": 700.0,
        "fy": 700.0,
        "cx": 640.0,
        "cy": 480.0,
        "dist_coeffs": [0.0, 0.0, 0.0, 0.0],
        "width": 1280,
        "height": 960,
    }
    ph = new_camera("pinhole", opts)
    fe = new_camera("fisheye", opts)
    # near the optical axis the models agree
    ll = np.array([[-PI / 2 + 0.01, 0.005]])
    np.testing.assert_allclose(
        ph.obj_to_image(ll), fe.obj_to_image(ll), atol=1e-4
    )


def test_fullframe_fisheye_hfov():
    """A point hfov/2 away from the axis lands on the image border."""
    opts = {
        "width": 1000,
        "height": 1000,
        "hfov": PI / 2,
        "center_dx": 0.0,
        "center_dy": 0.0,
        "radial": [0.0, 0.0, 0.0],
    }
    cam = new_camera("fullframe_fisheye", opts)
    p = cam.obj_to_image(np.array([[PI / 4, 0.0]]))  # half the hfov -> right edge
    assert p[0, 0] == pytest.approx(1.0, abs=1e-9)
    assert p[0, 1] == pytest.approx(0.5, abs=1e-9)
    p = cam.obj_to_image(np.array([[-PI / 4, 0.0]]))  # -> left edge
    assert p[0, 0] == pytest.approx(0.0, abs=1e-9)
    p = cam.obj_to_image(np.array([[0.0, 0.0]]))
    np.testing.assert_allclose(p[0], [0.5, 0.5], atol=1e-12)


def test_exclude_mask_selection():
    opts = {"width": 100, "height": 100, "selection": [25, 75, 25, 75]}
    cam = new_camera("equirectangular", opts)
    # center point maps inside selection -> kept
    p = cam.obj_to_image(np.array([[0.0, 0.0]]))
    assert np.isfinite(p).all()
    # point mapping to x ~ 0.1 -> excluded
    p = cam.obj_to_image(np.array([[-PI * 0.8, 0.0]]))
    assert np.isnan(p).all()


def test_longitude_selection_wraps():
    opts = {"longitude_selection": [PI / 2, PI * 1.5]}
    cam = new_camera("equirectangular", opts)
    p = cam.obj_to_image(np.array([[-PI * 0.75, 0.0]]))  # == +1.25pi
    assert np.isfinite(p).all()
    p = cam.obj_to_image(np.array([[0.0, 0.0]]))
    assert np.isnan(p).all()


def test_jax_numpy_agreement():
    import jax.numpy as jnp

    for cam_type in ("equirectangular", "cubic", "fullframe_fisheye"):
        cam = new_camera(cam_type, CAMS[cam_type])
        rng = np.random.default_rng(3)
        xy = rng.uniform(0.1, 0.9, (200, 2))
        a = cam.image_to_obj(xy)
        b = np.asarray(cam.image_to_obj(jnp.asarray(xy, dtype=jnp.float32), xp=jnp))
        np.testing.assert_allclose(a, b, atol=2e-3)


def test_registry_complete():
    assert set(REGISTRY) == {
        "normal",
        "perspective",
        "pinhole",
        "fisheye",
        "equirectangular",
        "fullframe_fisheye",
        "ocam_fisheye",
        "stupidoval",
        "cubic",
        "eqareanorthpole",
        "eqareasouthpole",
    }
