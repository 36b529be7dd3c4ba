"""Multi-region stereo end-to-end (VERDICT r1 item 10): projection
preset -> per-region templates -> AsyncMultiMapper with gain sharing ->
RegionComposer canvas (the OwlLive cylinder-slice stereo layout,
apps/livestitching/projection_modes.cpp:11-113)."""

import numpy as np
import pytest

import jax.numpy as jnp

from octvr_tpu.ops.color import yuv420p_to_rgb
from octvr_tpu.presets import RegionComposer, build_region_outputs
from octvr_tpu.runtime import AsyncMultiMapper
from octvr_tpu.stitch import Mapper
from octvr_tpu.template import compile_rig
from rigs import two_fisheye_rig
from test_stitch import render_camera_frames


def test_cylinder_slice_stereo_end_to_end():
    # 2304x1024-class layout at half scale: 1152x512
    (W, H), outs = build_region_outputs("cylinder_slice_2x25_3dv", 1152)
    assert (W, H) == (1152, 512)
    assert len(outs) == 6

    # same 2-cam rig serves both eyes (mono-as-stereo test rig)
    rig = two_fisheye_rig()
    for spec in rig["inputs"]:
        spec["options"]["width"] = 256
        spec["options"]["height"] = 256
    sizes = [(256, 256)] * 2
    frames = render_camera_frames(rig)

    mappers, gain_modes, rects = [], [], []
    for k, o in enumerate(outs):
        x, y, rw, rh = o["rect"]
        region_rig = {"output": o["output"], "inputs": rig["inputs"]}
        mt = compile_rig(region_rig, rw, rh)
        mt.create_masks()
        mappers.append(
            Mapper(
                mt,
                sizes,
                blend=16 if o["blend"] else 0,
                enable_gain=o["gain_mode"] >= 0,
            )
        )
        gain_modes.append(o["gain_mode"])
        rects.append(o["rect"])

    # gain sharing: each eye has ONE solving region; the slice regions
    # own the gains, pole regions run without compensation
    assert gain_modes == [0, -1, -1, 3, -1, -1]

    amm = AsyncMultiMapper(mappers, gain_modes=gain_modes)
    try:
        amm.push(frames)
        region_out = amm.pop()
    finally:
        amm.close()

    rgb_regions = [
        np.asarray(yuv420p_to_rgb(jnp.asarray(o))).astype(np.uint8)
        for o in region_out
    ]
    canvas = RegionComposer((W, H), rects).compose(rgb_regions)
    assert canvas.shape == (512, 1152, 3)

    # every region landed: nonzero coverage inside each rect
    for (x, y, rw, rh) in rects:
        sub = canvas[y : y + rh, x : x + rw]
        assert (sub > 0).mean() > 0.5, (x, y, rw, rh)

    # stereo symmetry: eye 0 and eye 1 slices see the same world here
    # (same rig both eyes), so the over/under halves must agree closely
    top = canvas[: H // 2, : outs[0]["rect"][2]].astype(np.float32)
    bot = canvas[H // 2 :, : outs[3]["rect"][2]].astype(np.float32)
    assert np.abs(top - bot).mean() < 1.0
