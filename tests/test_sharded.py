"""Sharded (multi-device mesh) stitch vs single-chip parity.

The sharded path must be the SAME product as the single-chip Mapper
(VERDICT r1 item 3): batched Pallas remap (interpret mode on the CPU
mesh), working-grid gains on the identical global subsample grid,
multiband/feather blend, YUV420P output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from octvr_tpu.ops.color import merge_yuv420p, split_yuv420p, yuv420p_to_rgb
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
    out_s, gains_s = single.stitch(frames)

    # pipeline="rgb" explicitly: this test is rgb-vs-rgb parity (the
    # yuv420 default is covered by test_sharded_yuv420_pipeline)
    sharded = ShardedMapper(
        mt, sizes, mesh, blend=blend, enable_gain=True, pipeline="rgb"
    )
    batch = np.stack([np.stack(frames)] * 2)
    out_m, gains_m = sharded.stitch_batch(batch)
    out_m = np.asarray(out_m)

    # gains: identical working grid -> near-exact agreement
    np.testing.assert_allclose(
        np.asarray(gains_m)[0], np.asarray(gains_s), rtol=2e-3
    )

    yuv = sharded.assemble_yuv(out_m[0])
    assert yuv.shape == np.asarray(out_s).shape

    rgb_single = np.asarray(yuv420p_to_rgb(jnp.asarray(np.asarray(out_s))))
    rgb_shard = np.asarray(yuv420p_to_rgb(jnp.asarray(yuv)))

    err = np.abs(rgb_shard - rgb_single)
    # round 4: reflect-101 extension of maps/weights about the union
    # box makes even the canvas-edge rows match the single chip, so the
    # old boundary allowance (mean < 1.0, interior < 0.5) tightens to
    # quantization noise
    assert err.mean() < 0.1, f"mean err {err.mean()}"
    interior = err[8:-8, 8:-8]
    assert interior.mean() < 0.05, f"interior mean {interior.mean()}"

    # both batch elements identical (same frames)
    np.testing.assert_array_equal(out_m[0], out_m[1])


def test_sharded_gain_effect(setup):
    """Darkened camera gets boosted; sharded gains match single-chip."""
    rig, mt, sizes, frames = setup
    mesh = make_mesh(1, 8)

    y, u, v = split_yuv420p(jnp.asarray(frames[1]))
    dark = np.asarray(merge_yuv420p((y * 0.7).astype(jnp.uint8), u, v))
    test_frames = [frames[0], dark]

    single = Mapper(mt, sizes, blend=-8, enable_gain=True)
    _, g_single = single.stitch(test_frames)

    sharded = ShardedMapper(
        mt, sizes, mesh, blend=-8, enable_gain=True, out_format="rgb"
    )
    out, g_sharded = sharded.stitch_batch(np.stack([np.stack(test_frames)]))
    g_single = np.asarray(g_single)
    g_sharded = np.asarray(g_sharded)[0]

    assert g_single[1] > g_single[0]  # dark camera boosted
    np.testing.assert_allclose(g_sharded, g_single, rtol=2e-3)

    # rgb out_format: full canvas [B, 3, Hp, Wp]
    W, H = mt.out_size
    rgb = np.asarray(out)[0][:, :H, :W]
    cam0 = rgb[:, H // 4 : -H // 4, W // 2 - 16 : W // 2 + 16].mean()
    cam1 = rgb[:, H // 4 : -H // 4, :16].mean()
    assert cam1 / cam0 > 0.75


@pytest.mark.slow
def test_sharded_bf16_blend(setup):
    """blend_dtype='bfloat16' on the sharded path: same product within
    bf16 ulp of the f32 path (the 16-bit analogue of the reference's
    CV_16S pyramids), and S=1 meshes drop the halo entirely."""
    rig, mt, sizes, frames = setup
    mesh = make_mesh(1, 4)
    batch = np.stack([np.stack(frames)])

    f32 = ShardedMapper(
        mt, sizes, mesh, blend=8, enable_gain=True, pipeline="rgb"
    )
    b16 = ShardedMapper(
        mt,
        sizes,
        mesh,
        blend=8,
        enable_gain=True,
        blend_dtype="bfloat16",
        pipeline="rgb",
    )
    y32 = f32.assemble_yuv(np.asarray(f32.stitch_batch(batch)[0])[0])
    y16 = b16.assemble_yuv(np.asarray(b16.stitch_batch(batch)[0])[0])
    err = np.abs(y32.astype(np.float32) - y16.astype(np.float32))
    assert err.mean() < 1.0, err.mean()

    single = make_mesh(1, 1)
    sm1 = ShardedMapper(
        mt, sizes, single, blend=8, enable_gain=True, pipeline="rgb"
    )
    assert sm1.plan.halo == 0  # no neighbor bands at S=1
    y1 = sm1.assemble_yuv(np.asarray(sm1.stitch_batch(batch)[0])[0])
    err1 = np.abs(y1.astype(np.float32) - y32.astype(np.float32))
    assert err1.mean() < 1.0, err1.mean()


def test_sharded_default_pipeline_is_yuv420(setup):
    """VERDICT r2 item 2: the production yuv420 paired-fan pipeline is
    the sharded default whenever output format and geometry allow."""
    rig, mt, sizes, frames = setup
    sm = ShardedMapper(mt, sizes, make_mesh(1, 2), blend=8)
    assert sm.plan.pipeline == "yuv420"
    sm_rgb = ShardedMapper(mt, sizes, make_mesh(1, 2), blend=8,
                           out_format="rgb")
    assert sm_rgb.plan.pipeline == "rgb"


@pytest.mark.slow
def test_sharded_yuv420_pipeline(setup):
    """Sharded yuv420 pipeline (pair-packed Y/UV fans, per-plane blends,
    half-res chroma bands with halo/2): same product as the single-chip
    yuv420 Mapper within rounding, and parity with the sharded RGB path
    up to the 4:2:0 chroma resample."""
    rig, mt, sizes, frames = setup
    mesh = make_mesh(1, 4)
    batch = np.stack([np.stack(frames)])

    sm = ShardedMapper(
        mt, sizes, mesh, blend=8, enable_gain=True, pipeline="yuv420"
    )
    yuv_sh = sm.assemble_yuv(np.asarray(sm.stitch_batch(batch)[0])[0])

    single = Mapper(mt, sizes, blend=8, enable_gain=True, pipeline="yuv420")
    out_s, gains_s = single.stitch(frames)
    out_s = np.asarray(out_s)

    h = out_s.shape[0] * 2 // 3
    y_err = np.abs(
        yuv_sh[:h].astype(np.float32) - out_s[:h].astype(np.float32)
    )
    # round 4: edge rows match too (reflect extension); full-plane bars
    assert y_err.mean() < 0.1, y_err.mean()
    c_err = np.abs(
        yuv_sh[h:].astype(np.float32) - out_s[h:].astype(np.float32)
    )
    assert c_err.mean() < 0.2, c_err.mean()

    g_sh = np.asarray(sm.stitch_batch(batch)[1])[0]
    np.testing.assert_allclose(g_sh, np.asarray(gains_s), rtol=5e-3, atol=5e-3)
