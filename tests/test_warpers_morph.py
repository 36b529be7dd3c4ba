"""Rotation warpers, control-point morphing, graph-cut seams, runtime."""

import math

import numpy as np
import pytest

from octvr_tpu.cameras.warpers import PROJECTORS, RotationWarper

PI = math.pi


@pytest.mark.parametrize("kind", sorted(PROJECTORS))
def test_projector_roundtrip(kind):
    w = RotationWarper(kind, 1.0)
    p = w.projector
    rng = np.random.default_rng(0)
    if "spherical" in kind.lower() or kind == "fisheye" or kind == "stereographic":
        # spherical-family v lives in (0, pi)
        u = rng.uniform(-0.7, 0.7, 500)
        v = rng.uniform(0.8, 2.2, 500)
        if kind in ("fisheye", "stereographic"):
            # plane-radius parametrizations: sample valid (u, v) via bwd
            u = rng.uniform(0.3, 1.5, 500)
            v = rng.uniform(0.3, 1.5, 500)
    else:
        u = rng.uniform(-0.7, 0.7, 500)
        v = rng.uniform(-0.6, 0.6, 500)
    d = p.bwd(u, v, np)
    u2, v2 = p.fwd(d, np)
    np.testing.assert_allclose(u2, u, atol=1e-9)
    np.testing.assert_allclose(v2, v, atol=1e-9)


def test_spherical_warp_identity_view():
    """A spherical warp of a central-view camera keeps the image center
    fixed and produces valid maps."""
    f = 300.0
    w, h = 320, 240
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    R = np.eye(3)
    warper = RotationWarper("spherical", f)
    tl, m1, m2 = warper.build_maps((w, h), K, R)
    assert (m1 >= 0).mean() > 0.8
    # center of dst maps back to center of src
    u, v = warper.warp_point((w / 2, h / 2), K, R)
    dh, dw = m1.shape
    cy, cx = int(v - tl[1]), int(u - tl[0])
    assert abs(m1[cy, cx] * w - w / 2) < 2.0
    assert abs(m2[cy, cx] * h - h / 2) < 2.0


def test_warp_respects_rotation():
    """Rotating the camera about y shifts the spherical warp in u."""
    f = 300.0
    w, h = 320, 240
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    a = 0.4
    Ry = np.array(
        [
            [math.cos(a), 0, math.sin(a)],
            [0, 1, 0],
            [-math.sin(a), 0, math.cos(a)],
        ]
    )
    warper = RotationWarper("spherical", f)
    u0, _ = warper.warp_point((w / 2, h / 2), K, np.eye(3))
    u1, _ = warper.warp_point((w / 2, h / 2), K, Ry)
    assert abs((u1 - u0) - f * a) < 1.0


def test_morph_moves_control_points():
    """Morphing pulls both observations of a feature to a common canvas
    point."""
    import sys

    sys.path.insert(0, "tests")
    from rigs import two_fisheye_rig

    from octvr_tpu.template import compile_rig
    from octvr_tpu.template.morph import morph_control_points

    rig = two_fisheye_rig()
    mt = compile_rig(rig, 256, 128)
    # a fake control point in the overlap: the same physical direction
    # seen by both cameras, deliberately perturbed in camera 1
    cam0, cam1 = mt._input_cams
    ll = np.array([[PI / 2 * 0.95, 0.1]])  # in the overlap band
    p0 = cam0.obj_to_image(ll)[0]
    p1 = cam1.obj_to_image(ll)[0]
    assert np.isfinite(p0).all() and np.isfinite(p1).all()
    # perturb camera 1's observation (pretend calibration error)
    cps = [[0, 1, p0[0], p0[1], p1[0] + 0.004, p1[1]]]
    before1 = mt.inputs[1].map1.copy()
    morph_control_points(mt, cps)
    # maps changed near the control point for at least one input
    changed = (before1 != mt.inputs[1].map1).sum()
    assert changed > 0


def test_graphcut_prefers_low_cost_seam():
    from octvr_tpu.template.graphcut import graphcut_seam_find

    h, w = 32, 48
    img1 = np.zeros((h, w, 3))
    img2 = np.zeros((h, w, 3))
    # images disagree strongly except at column band 20-24 of the overlap
    img1[..., 0] = 1.0
    img2[..., 0] = 0.0
    img1[:, 20:25] = 0.5
    img2[:, 20:25] = 0.5
    # partial overlap so terminal pins exist (exclusive regions)
    m1 = np.zeros((h, w), np.uint8)
    m2 = np.zeros((h, w), np.uint8)
    m1[:, :32] = 255
    m2[:, 16:] = 255
    s1, s2 = graphcut_seam_find([img1, img2], [m1, m2], [(0, 0), (0, 0)])
    # partition holds where both covered
    both = (m1 > 0) & (m2 > 0)
    assert (((s1 > 0) ^ (s2 > 0)) | ~both).all()
    # the seam runs through the agreement band:左 of band -> img1? at
    # least the cut column lies in [19, 26]
    col_owner = (s1 > 0).mean(axis=0)
    cut_cols = np.nonzero((col_owner > 0.01) & (col_owner < 0.99))[0]
    boundary = np.nonzero(np.diff((col_owner > 0.5).astype(int)))[0]
    assert len(boundary) >= 1
    assert all(18 <= b <= 26 for b in boundary)


def test_async_pipeline_runs():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import sys

    sys.path.insert(0, "tests")
    from rigs import two_fisheye_rig
    from test_stitch import render_camera_frames

    from octvr_tpu.runtime import AsyncMultiMapper
    from octvr_tpu.stitch import Mapper
    from octvr_tpu.template import compile_rig

    rig = two_fisheye_rig()
    for spec in rig["inputs"]:
        spec["options"]["width"] = 128
        spec["options"]["height"] = 128
    mt = compile_rig(rig, 128, 64)
    mt.create_masks()
    sizes = [(128, 128)] * 2
    m0 = Mapper(mt, sizes, blend=-4, enable_gain=True)
    m1 = Mapper(mt, sizes, blend=0, enable_gain=True)
    amm = AsyncMultiMapper([m0, m1], gain_modes=[0, 0])  # output 1 reuses 0's gains
    frames = render_camera_frames(rig)
    for _ in range(3):
        amm.push(frames)
    outs = [amm.pop() for _ in range(3)]
    amm.close()
    assert len(outs) == 3
    assert outs[0][0].shape == (96, 128)
    assert outs[0][1].shape == (96, 128)


def test_stitcher_facade_end_to_end():
    import sys

    sys.path.insert(0, "tests")
    import numpy as np
    from test_registration import render_view, yaw_cameras

    from octvr_tpu.stitcher_facade import Stitcher

    imgs = [
        render_view(R, 380.0, 400, 300).astype(np.uint8)
        for R in yaw_cameras(5, 30.0)
    ]
    res = Stitcher(conf_thresh=0.5, blend=8).stitch(
        imgs, out_width=512, use_device=False
    )
    assert res.panorama.shape == (256, 512, 3)
    assert len(res.indices) == 5
    assert res.rms < 2.0
    covered = (res.panorama.sum(-1) > 0).mean()
    # 5 cameras x 30deg steps ~ 173deg of longitude, +-21deg latitude
    assert 0.05 < covered < 0.4, covered


def test_projection_presets_stereo_layout():
    """Config: stereo cylinder-slice + polar caps layout (the OwlLive
    projection preset, projection_modes.cpp) composes into one frame."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import sys

    sys.path.insert(0, "tests")
    import numpy as np
    from rigs import two_fisheye_rig
    from test_stitch import render_camera_frames

    from octvr_tpu.ops.color import yuv420p_to_rgb
    from octvr_tpu.presets import RegionComposer, build_region_outputs
    from octvr_tpu.stitch import Mapper
    from octvr_tpu.template import compile_rig
    import jax.numpy as jnp

    (W, H), outs = build_region_outputs("cylinder_slice_2x25_3dv", 576)
    assert (W, H) == (576, 256)
    assert len(outs) == 6
    # gain sharing: first gain region per eye owns, others copy
    assert outs[0]["gain_mode"] == 0 and outs[3]["gain_mode"] == 3

    rig = two_fisheye_rig()
    for spec in rig["inputs"]:
        spec["options"]["width"] = 256
        spec["options"]["height"] = 256
    frames = render_camera_frames(rig)

    region_frames = []
    for o in outs[:3]:  # one eye is enough for the layout test
        x, y, rw, rh = o["rect"]
        r = dict(rig)
        r["output"] = o["output"]
        mt = compile_rig(r, rw, rh)
        mt.create_masks()
        m = Mapper(
            mt,
            [(256, 256)] * 2,
            blend=-4 if o["blend"] else 0,
            enable_gain=False,
        )
        out, _ = m.stitch(frames)
        region_frames.append(
            np.clip(
                np.asarray(yuv420p_to_rgb(jnp.asarray(np.asarray(out)))),
                0,
                255,
            ).astype(np.uint8)
        )
    comp = RegionComposer((W, H), [o["rect"] for o in outs[:3]])
    canvas = comp.compose(region_frames)
    assert canvas.shape == (256, 576, 3)
    # all three regions carry content
    assert canvas[:128, :512].mean() > 10  # cylinder slice
    assert canvas[:64, 512:].mean() > 10  # north cap
    assert canvas[64:128, 512:].mean() > 10  # south cap
