"""Real-image multiband blend smoke — the reference's stock blender
test (modules/stitching/test/test_blenders.cpp:47,
TEST(MultiBandBlender, CanBlendTwoImages)): blend lena's left half with
baboon's right half across a mid-canvas seam.  The reference compares
against a stored gold from opencv_extra; we assert the structural
contract instead: regions outside the blend support reproduce their
sources, the blend strictly smooths the seam discontinuity vs a hard
paste, and the bf16 MXU pyramid path tracks f32."""

import os

import numpy as np
import pytest

from octvr_tpu.stitch.blenders import build_multiband_plan, multiband_blend

DATA = "/root/reference/samples/data"
BANDS = 5
SUPPORT = 5 * (1 << BANDS)  # rows/cols of blend influence around a seam


def _load(name):
    PIL = pytest.importorskip("PIL.Image")
    p = os.path.join(DATA, name)
    if not os.path.exists(p):
        pytest.skip(f"{name} not present")
    im = np.asarray(PIL.open(p).convert("RGB"), dtype=np.float32)
    assert im.shape == (512, 512, 3)
    return np.moveaxis(im, -1, 0)  # [C, H, W]


@pytest.fixture(scope="module")
def blended():
    lena = _load("lena.jpg")
    baboon = _load("baboon.jpg")
    h, w = 512, 512
    m1 = np.zeros((h, w), np.uint8)
    m1[:, : w // 2] = 255
    m2 = np.zeros((h, w), np.uint8)
    m2[:, w // 2 :] = 255
    rois = [(0, 0, w, h), (0, 0, w, h)]
    outs = {}
    for dt in ("float32", "bfloat16"):
        plan = build_multiband_plan(
            [m1, m2], rois, BANDS, (w, h), dtype=dt
        )
        outs[dt] = np.asarray(
            multiband_blend(plan, [lena, baboon], (w, h))
        ).astype(np.float32)
    return lena, baboon, outs


def test_sources_reproduced_outside_support(blended):
    lena, baboon, outs = blended
    out = outs["float32"]
    lo, hi = 256 - SUPPORT, 256 + SUPPORT
    err_l = np.abs(out[:, :, :lo] - lena[:, :, :lo])
    err_r = np.abs(out[:, :, hi:] - baboon[:, :, hi:])
    assert err_l.mean() < 1.5, err_l.mean()
    assert err_r.mean() < 1.5, err_r.mean()


def test_seam_smoother_than_hard_paste(blended):
    lena, baboon, outs = blended
    out = outs["float32"]
    # column-to-column jump across the seam: blending must strictly
    # reduce the hard-paste discontinuity between the two photographs
    blended_jump = np.abs(out[:, :, 256] - out[:, :, 255]).mean()
    hard_jump = np.abs(baboon[:, :, 256] - lena[:, :, 255]).mean()
    interior_jump = np.abs(lena[:, :, 101] - lena[:, :, 100]).mean()
    assert blended_jump < 0.5 * hard_jump, (blended_jump, hard_jump)
    # and be of the same order as natural image gradients
    assert blended_jump < 3.0 * interior_jump, (blended_jump, interior_jump)


def test_bf16_pyramids_track_f32(blended):
    _, _, outs = blended
    d = np.abs(outs["bfloat16"] - outs["float32"])
    assert d.mean() < 1.5, d.mean()
    assert np.percentile(d, 99) < 6.0, np.percentile(d, 99)
