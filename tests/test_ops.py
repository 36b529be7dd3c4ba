"""Op-level tests: color conversions, remap gather, pyramids, resize."""

import numpy as np
import pytest

import jax.numpy as jnp

from octvr_tpu.ops.color import (
    merge_uyvy,
    merge_yuv420p,
    rgb_to_yuv420p,
    split_uyvy,
    split_yuv420p,
    yuv420p_to_rgb,
)
from octvr_tpu.ops.pyramid import pyr_down, pyr_up
from octvr_tpu.ops.remap import remap_apply, remap_plan
from octvr_tpu.ops.resize import resize_bilinear, resize_nearest


def test_yuv_rgb_roundtrip():
    # smooth gradients: 4:2:0 chroma subsampling is near-lossless there
    y, x = np.mgrid[0:64, 0:96].astype(np.float32)
    rgb = np.stack(
        [30 + x * 2, 40 + y * 2.5, 220 - x - y], axis=-1
    ).clip(0, 255)
    buf = rgb_to_yuv420p(jnp.asarray(rgb))
    assert buf.shape == (96, 96) and buf.dtype == jnp.uint8
    back = np.asarray(yuv420p_to_rgb(buf))
    err = np.abs(back - rgb)
    assert err.mean() < 2.0
    assert np.percentile(err, 95) < 6.0


def test_yuv_split_merge():
    rng = np.random.default_rng(1)
    buf = rng.integers(0, 255, (48, 64), dtype=np.uint8)
    y, u, v = split_yuv420p(jnp.asarray(buf))
    assert y.shape == (32, 64) and u.shape == (16, 32) and v.shape == (16, 32)
    back = np.asarray(merge_yuv420p(y, u, v))
    np.testing.assert_array_equal(back, buf)


def test_uyvy_split_merge():
    rng = np.random.default_rng(2)
    buf = rng.integers(0, 255, (16, 64), dtype=np.uint8)  # 32 px wide
    y, u, v = split_uyvy(jnp.asarray(buf))
    assert y.shape == (16, 32) and u.shape == (16, 16)
    back = np.asarray(merge_uyvy(y, u, v))
    np.testing.assert_array_equal(back, buf)


def test_remap_identity():
    h, w = 32, 48
    ys, xs = np.meshgrid(
        (np.arange(h) + 0.5) / h, (np.arange(w) + 0.5) / w, indexing="ij"
    )
    plan = remap_plan(xs.astype(np.float32), ys.astype(np.float32), h, w)
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (3, h, w)).astype(np.float32)
    out = np.asarray(remap_apply(jnp.asarray(img), plan))
    np.testing.assert_allclose(out, img, atol=1e-3)


def test_remap_invalid_fills_zero():
    m1 = np.full((4, 4), -1.0, dtype=np.float32)
    m2 = np.full((4, 4), -1.0, dtype=np.float32)
    m1[0, 0] = 0.5
    m2[0, 0] = 0.5
    plan = remap_plan(m1, m2, 8, 8)
    img = jnp.ones((3, 8, 8), dtype=jnp.float32) * 100.0
    out = np.asarray(remap_apply(img, plan))
    assert out[0, 0, 0] == pytest.approx(100.0)
    assert (out.reshape(3, -1)[:, 1:] == 0).all()


def test_remap_bilinear_interpolates():
    """A 0.5-pixel shift averages neighbors."""
    h = w = 8
    img = np.zeros((1, h, w), dtype=np.float32)
    img[0, :, 4] = 100.0
    # sample at x pixel coordinate 3.5 -> normalized (3.5+0.5)/w
    m1 = np.full((1, 1), 4.0 / w, dtype=np.float32)
    m2 = np.full((1, 1), 0.5 + 0.5 / h, dtype=np.float32)
    plan = remap_plan(m1, m2, h, w)
    out = np.asarray(remap_apply(jnp.asarray(img), plan))
    assert out[0, 0, 0] == pytest.approx(50.0, abs=1e-3)


def test_pyr_down_shape_and_dc():
    img = jnp.ones((3, 64, 128), dtype=jnp.float32) * 7.0
    d = pyr_down(img)
    assert d.shape == (3, 32, 64)
    np.testing.assert_allclose(np.asarray(d), 7.0, atol=1e-5)


def test_pyr_up_shape_and_dc():
    img = jnp.ones((2, 16, 24), dtype=jnp.float32) * 3.0
    u = pyr_up(img)
    assert u.shape == (2, 32, 48)
    # interior is DC-preserving (borders may dip from zero padding)
    np.testing.assert_allclose(np.asarray(u)[:, 4:-4, 4:-4], 3.0, atol=1e-4)


def test_pyramid_roundtrip_smooth():
    """down->up on a smooth image recovers it closely."""
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    img = (np.sin(x / 10) + np.cos(y / 13))[None] * 50 + 100
    rec = np.asarray(pyr_up(pyr_down(jnp.asarray(img))))
    err = np.abs(rec[:, 4:-4, 4:-4] - img[:, 4:-4, 4:-4])
    assert err.mean() < 1.5


def test_resize_matches_expectations():
    img = np.arange(16, dtype=np.float32).reshape(4, 4)
    out = resize_bilinear(img, 2, 2)
    # cv INTER_LINEAR with half-pixel centers: averages 2x2 blocks
    expect = img.reshape(2, 2, 2, 2).mean(axis=(1, 3))
    np.testing.assert_allclose(out, expect, atol=1e-5)
    near = resize_nearest(img, 2, 2)
    np.testing.assert_array_equal(near, [[0, 2], [8, 10]])


def test_uyvy_to_yuv420p():
    """4:2:2 capture -> 4:2:0 engine format: Y passthrough, chroma row
    pairs round-to-nearest averaged (DeckLink input path; the stream
    CLI's numpy twin must agree exactly)."""
    rng = np.random.default_rng(11)
    h, w = 8, 16
    buf = rng.integers(0, 255, (h, w * 2), dtype=np.uint8)
    from octvr_tpu.ops.color import split_uyvy, uyvy_to_yuv420p

    out = np.asarray(uyvy_to_yuv420p(jnp.asarray(buf)))
    y, u, v = (np.asarray(a) for a in split_uyvy(jnp.asarray(buf)))
    assert np.array_equal(out[:h], y)
    exp_u = (u[0::2].astype(np.uint16) + u[1::2] + 1) // 2
    exp_v = (v[0::2].astype(np.uint16) + v[1::2] + 1) // 2
    assert np.array_equal(out[h:, : w // 2], exp_u.astype(np.uint8))
    assert np.array_equal(out[h:, w // 2 :], exp_v.astype(np.uint8))

    # the stream CLI's host-side twin
    quads = buf.reshape(h, w // 2, 4)
    y2 = quads[..., 1::2].reshape(h, w)
    assert np.array_equal(y2, y)
