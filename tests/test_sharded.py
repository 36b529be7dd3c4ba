"""Sharded (multi-device mesh) stitch vs single-chip parity."""

import numpy as np
import pytest

import jax

from octvr_tpu.parallel.sharded import ShardedMapper, make_mesh
from octvr_tpu.stitch import Mapper
from octvr_tpu.template import compile_rig
from rigs import two_fisheye_rig
from test_stitch import render_camera_frames


@pytest.fixture(scope="module")
def setup():
    rig = two_fisheye_rig()
    for spec in rig["inputs"]:  # smaller cameras for CPU-mesh speed
        spec["options"]["width"] = 256
        spec["options"]["height"] = 256
    mt = compile_rig(rig, 256, 128)
    mt.create_masks()
    sizes = [(256, 256)] * 2
    frames = render_camera_frames(rig)
    return rig, mt, sizes, frames


@pytest.mark.parametrize("blend", [8, -8])
def test_sharded_matches_single_chip(setup, blend):
    rig, mt, sizes, frames = setup
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(2, 4)

    single = Mapper(mt, sizes, blend=blend, enable_gain=True)
    out_s, gains = single.stitch(frames)

    sharded = ShardedMapper(mt, sizes, mesh, blend=blend, enable_gain=True)
    batch = np.stack([np.stack(frames)] * 2)
    out_m = np.asarray(sharded.stitch_batch(batch))  # [2, 3, Hp, Wp]

    # compare RGB canvases (single-chip converts to YUV; reconvert)
    from octvr_tpu.ops.color import yuv420p_to_rgb
    import jax.numpy as jnp

    rgb_single = np.asarray(yuv420p_to_rgb(jnp.asarray(np.asarray(out_s))))
    W, H = mt.out_size
    rgb_shard = np.moveaxis(out_m[0][:, :H, :W], 0, -1)

    err = np.abs(rgb_shard - rgb_single)
    # YUV420 roundtrip on the single-chip side costs ~1-2 LSB; the canvas
    # top/bottom rows differ in pyramid border handling (zero-pad vs
    # aligned-ROI edge) -- compare the interior strictly
    assert err.mean() < 3.0, f"mean err {err.mean()}"
    interior = err[12:-12]
    assert interior.mean() < 2.0, f"interior mean {interior.mean()}"
    assert np.percentile(interior, 99.5) < 20.0

    # both batch elements identical (same frames)
    np.testing.assert_allclose(out_m[0], out_m[1], atol=1e-4)


def test_sharded_gain_psum(setup):
    """Gains from the sharded path (full-res psum'd sums) agree with the
    single-chip working-scale gains to a few percent."""
    rig, mt, sizes, frames = setup
    mesh = make_mesh(1, 8)
    frames_dim = [
        np.asarray(f, dtype=np.float32) for f in frames
    ]
    # darken camera 1
    from octvr_tpu.ops.color import split_yuv420p, merge_yuv420p
    import jax.numpy as jnp

    y, u, v = split_yuv420p(jnp.asarray(frames[1]))
    dark = np.asarray(merge_yuv420p((y * 0.7).astype(jnp.uint8), u, v))
    test_frames = [frames[0], dark]

    single = Mapper(mt, sizes, blend=-8, enable_gain=True)
    _, g_single = single.stitch(test_frames)

    sharded = ShardedMapper(mt, sizes, mesh, blend=-8, enable_gain=True)
    out = sharded.stitch_batch(np.stack([np.stack(test_frames)]))
    out.block_until_ready()
    # gains are internal to the sharded step; assert the *effect*: the two
    # cameras' regions match in brightness despite the darkened input
    W, H = mt.out_size
    rgb = np.asarray(out)[0][:, :H, :W]
    cam0 = rgb[:, H // 4 : -H // 4, W // 2 - 16 : W // 2 + 16].mean()
    cam1 = rgb[:, H // 4 : -H // 4, :16].mean()
    g = np.asarray(g_single)
    assert g[1] > g[0]  # single-chip boosts the dark camera
    # sharded output ratio must be closer to 1 than the uncorrected 0.7
    assert cam1 / cam0 > 0.75
