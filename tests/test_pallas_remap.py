"""Interpret-mode parity of the Pallas remap kernel vs the XLA gather
path (exact same bilinear taps/weights; reference semantics from
cudawarping/src/cuda/fast_remap.cu: normalized maps, clamp-to-edge,
negative map -> zero)."""

import jax.numpy as jnp
import numpy as np
import pytest

from octvr_tpu.ops.pallas_remap import (
    merge_remap_plans,
    pallas_remap_apply,
    pallas_remap_apply_batched,
    pallas_remap_plan,
)
from octvr_tpu.ops.remap import pack_rgb, remap_apply_packed, remap_plan


def _arc_maps(rh, rw):
    """Smooth maps with rotating arcs (the pole-camera access pattern)
    plus an invalid hole."""
    yy, xx = np.meshgrid(
        np.linspace(0, 1, rh), np.linspace(0, 1, rw), indexing="ij"
    )
    m1 = (0.5 + 0.45 * np.cos(2 * np.pi * xx) * (0.3 + 0.6 * yy)).astype(
        np.float32
    )
    m2 = (0.5 + 0.45 * np.sin(2 * np.pi * xx) * (0.3 + 0.6 * yy)).astype(
        np.float32
    )
    m1[10:20, 30:60] = -1
    m2[10:20, 30:60] = -1
    # full-width invalid band -> fully-empty tiles (exercises the
    # batched path's empty-tile dropping + slot placement)
    m1[32:48, :] = -1
    m2[32:48, :] = -1
    return m1, m2


def test_pallas_remap_matches_xla_gather():
    rng = np.random.default_rng(1)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    img = rng.uniform(0, 255, (3, in_h, in_w)).astype(np.float32)
    packed = pack_rgb(jnp.asarray(img))

    ref = np.asarray(remap_apply_packed(packed, remap_plan(m1, m2, in_h, in_w)))
    for patch in ((8, 128), (16, 64), (32, 32)):
        pp = pallas_remap_plan(m1, m2, in_h, in_w, patch=patch)
        got = np.asarray(
            pallas_remap_apply(packed.reshape(in_h, in_w), pp, interpret=True)
        )
        assert np.abs(ref - got).max() < 1e-3, patch


def test_pallas_remap_batched_matches_xla_gather():
    rng = np.random.default_rng(2)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    img = rng.uniform(0, 255, (3, in_h, in_w)).astype(np.float32)
    packed = pack_rgb(jnp.asarray(img)).reshape(in_h, in_w)

    bp = merge_remap_plans([(m1, m2), (m2, m1)], in_h, in_w)
    outs = pallas_remap_apply_batched(jnp.stack([packed, packed]), bp, interpret=True)
    for maps, out in zip([(m1, m2), (m2, m1)], outs):
        ref = np.asarray(
            remap_apply_packed(
                packed.reshape(-1), remap_plan(*maps, in_h, in_w)
            )
        )
        assert np.abs(ref - np.asarray(out)).max() < 1e-3


def test_pallas_remap_batched_bf16_output():
    """out_dtype='bfloat16': kernel-side cast, values within bf16 ulp of
    the f32 path (feeds the bf16 blend with no XLA convert)."""
    rng = np.random.default_rng(4)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    img = rng.uniform(0, 255, (3, in_h, in_w)).astype(np.float32)
    packed = pack_rgb(jnp.asarray(img)).reshape(in_h, in_w)

    bp = merge_remap_plans([(m1, m2), (m2, m1)], in_h, in_w)
    outs32 = pallas_remap_apply_batched(
        jnp.stack([packed, packed]), bp, interpret=True
    )
    outs16 = pallas_remap_apply_batched(
        jnp.stack([packed, packed]), bp, interpret=True, out_dtype="bfloat16"
    )
    for o32, o16 in zip(outs32, outs16):
        assert o16.dtype == jnp.bfloat16
        err = np.abs(np.asarray(o32) - np.asarray(o16, dtype=np.float32))
        # bf16 has 8 mantissa bits: <= 0.5 ulp of 255 = 0.5
        assert err.max() <= 1.0, err.max()


@pytest.mark.slow
def test_pallas_remap_batched_channel_counts():
    """nc=1 (luma) and nc=2 (chroma pair) kernels: byte-packed channels
    agree with the nc=3 path on the same maps (the YUV420-native
    pipeline remaps Y with nc=1 at full res and U|V with nc=2 at half
    res)."""
    rng = np.random.default_rng(5)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    chans = rng.uniform(0, 255, (3, in_h, in_w)).astype(np.float32)
    packed3 = pack_rgb(jnp.asarray(chans)).reshape(in_h, in_w)

    bp = merge_remap_plans([(m1, m2)], in_h, in_w)
    ref = np.asarray(
        pallas_remap_apply_batched(packed3[None], bp, interpret=True)[0]
    )

    # nc=1: raw values (channel 0)
    p1 = jnp.asarray(np.round(chans[0]).astype(np.int32))[None]
    got1 = np.asarray(
        pallas_remap_apply_batched(p1, bp, interpret=True, nc=1)[0]
    )
    assert np.abs(got1[0] - ref[0]).max() < 1e-3

    # nc=2: ch0 | ch1<<8
    p2 = jnp.asarray(
        (np.round(chans[0]).astype(np.int32))
        | (np.round(chans[1]).astype(np.int32) << 8)
    )[None]
    got2 = np.asarray(
        pallas_remap_apply_batched(p2, bp, interpret=True, nc=2)[0]
    )
    assert np.abs(got2 - ref[:2]).max() < 1e-3


@pytest.mark.slow
def test_pallas_remap_paired():
    """paired=True (one gather per fan row, both horizontal taps
    byte-packed): matches the unpaired path for nc=1 and nc=2."""
    from octvr_tpu.ops.pallas_remap import pack_pairs

    rng = np.random.default_rng(6)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    chans = rng.uniform(0, 255, (2, in_h, in_w)).astype(np.float32)
    q = [jnp.asarray(np.round(c).astype(np.int32)) for c in chans]

    bp_u = merge_remap_plans([(m1, m2)], in_h, in_w)
    bp_p = merge_remap_plans([(m1, m2)], in_h, in_w, paired=True)

    ref1 = pallas_remap_apply_batched(q[0][None], bp_u, interpret=True, nc=1)[0]
    got1 = pallas_remap_apply_batched(
        pack_pairs([q[0]])[None], bp_p, interpret=True, nc=1, paired=True
    )[0]
    assert np.abs(np.asarray(ref1) - np.asarray(got1)).max() < 1e-3

    ref2 = pallas_remap_apply_batched(
        (q[0] | (q[1] << 8))[None], bp_u, interpret=True, nc=2
    )[0]
    got2 = pallas_remap_apply_batched(
        pack_pairs(q)[None], bp_p, interpret=True, nc=2, paired=True
    )[0]
    assert np.abs(np.asarray(ref2) - np.asarray(got2)).max() < 1e-3


@pytest.mark.slow
def test_pallas_remap_edge_clamp_weights():
    """Maps sampling past the last source row/col (py > in_h-1): the
    clamp collapses both taps onto one row, and the grouped kernel's
    nested-select wk must still deliver total weight 1 (regression for
    the bottom-edge darkening bug: wk was wy0=1-fy instead of 1)."""
    rng = np.random.default_rng(8)
    in_h, in_w = 96, 256
    rh, rw = 32, 256
    yy, xx = np.meshgrid(
        np.linspace(0, 1, rh), np.linspace(0, 1, rw), indexing="ij"
    )
    # bottom band samples past the last row: py in (in_h-1, in_h-0.5)
    m1 = (0.1 + 0.8 * xx).astype(np.float32)
    m2 = (0.6 + 0.3 * yy).astype(np.float32)
    m2[-8:, :] = np.linspace(
        (in_h - 0.9) / in_h, (in_h - 0.01) / in_h, 8, dtype=np.float32
    )[:, None]
    # right band samples past the last col
    m1[:, -32:] = np.linspace(
        (in_w - 0.9) / in_w, (in_w - 0.01) / in_w, 32, dtype=np.float32
    )[None, :]

    img = rng.uniform(64, 255, (3, in_h, in_w)).astype(np.float32)
    packed = pack_rgb(jnp.asarray(img)).reshape(in_h, in_w)

    ref = np.asarray(remap_apply_packed(packed.reshape(-1), remap_plan(m1, m2, in_h, in_w)))
    bp = merge_remap_plans([(m1, m2)], in_h, in_w)
    got = np.asarray(
        pallas_remap_apply_batched(packed[None], bp, interpret=True)[0]
    )
    assert np.abs(ref - got).max() < 1e-3

    # paired nc=1 path through the same clamped maps
    from octvr_tpu.ops.pallas_remap import pack_pairs

    y = jnp.asarray(np.round(img[0]).astype(np.int32))
    bp_p = merge_remap_plans([(m1, m2)], in_h, in_w, paired=True)
    ref1 = np.asarray(
        pallas_remap_apply_batched(y[None], bp, interpret=True, nc=1)[0]
    )
    got1 = np.asarray(
        pallas_remap_apply_batched(
            pack_pairs([y])[None], bp_p, interpret=True, nc=1, paired=True
        )[0]
    )
    assert np.abs(ref1 - got1).max() < 1e-3


@pytest.mark.slow  # opt-in rowpack layout; fast-loop budget (round 5)
def test_pallas_remap_rowpack():
    """rowpack (two source rows per int32, one gather per TWO rows):
    matches the paired nc=1 path bit-for-bit, including residual
    (out-of-window) pixels."""
    from octvr_tpu.ops.pallas_remap import pack_pair_rows, pack_pairs

    rng = np.random.default_rng(7)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    y = jnp.asarray(
        np.round(rng.uniform(0, 255, (in_h, in_w))).astype(np.int32)
    )

    bp = merge_remap_plans([(m1, m2)], in_h, in_w, paired=True,
                           kh_multiple=16)
    assert bp.KH % 16 == 0
    ref = pallas_remap_apply_batched(
        pack_pairs([y])[None], bp, interpret=True, nc=1, paired=True
    )[0]
    got = pallas_remap_apply_batched(
        pack_pair_rows(y)[None], bp, interpret=True, nc=1, paired=True,
        rowpack=True,
    )[0]
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-3


@pytest.mark.slow  # opt-in src_windows layout; fast-loop budget (round 5)
def test_pallas_remap_concat_source():
    """Concat-source mode: per-input source HEIGHTS (sliced buffers)
    with row offsets baked into the window tables — one kernel, no
    per-input launch split.  Output must match the classic stacked
    path bit-for-bit, including residual taps."""
    rng = np.random.default_rng(9)
    in_h, in_w = 96, 256
    m1a, m2a = _arc_maps(64, 256)
    # input B samples only source rows ~[40, 70)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, 64), np.linspace(0, 1, 256), indexing="ij"
    )
    m1b = (0.1 + 0.8 * xx).astype(np.float32)
    m2b = ((42 + 26 * yy) / in_h).astype(np.float32)
    m1b[5:9, 40:80] = -1
    m2b[5:9, 40:80] = -1

    img = rng.integers(0, 255, (in_h, in_w)).astype(np.int32)
    imgj = jnp.asarray(img)

    bp_classic = merge_remap_plans(
        [(m1a, m2a), (m1b, m2b)], in_h, in_w
    )
    ref = pallas_remap_apply_batched(
        jnp.stack([imgj, imgj]), bp_classic, interpret=True, nc=1
    )

    # slice input B to rows [36, 76) and rebase its map
    lo, h_b = 36, 40
    m2b_s = ((m2b * in_h) - lo) / h_b
    m2b_s = np.where(m2b < 0, -1.0, m2b_s).astype(np.float32)
    bp_cat = merge_remap_plans(
        [(m1a, m2a), (m1b, m2b_s)], [in_h, h_b], in_w
    )
    assert bp_cat.concat_heights and bp_cat.concat_heights[1][2] == h_b
    got = pallas_remap_apply_batched(
        [imgj, imgj[lo : lo + h_b]], bp_cat, interpret=True, nc=1
    )
    for r, g in zip(ref, got):
        assert np.abs(np.asarray(r) - np.asarray(g)).max() < 1e-3


@pytest.mark.slow  # non-default batch path; the production paired nc=1 variant stays fast; fast-loop budget (round 5)
def test_pallas_remap_frames_axis():
    """frames_axis=True: B frames through ONE grid must match B
    separate launches bit-for-bit (incl. residual taps and empty-tile
    slot placement) — the launch-amortization path (VERDICT r4 #1/#2)."""
    rng = np.random.default_rng(9)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    bp = merge_remap_plans([(m1, m2), (m2, m1)], in_h, in_w)

    B = 3
    packs = []
    for b in range(B):
        img = rng.uniform(0, 255, (3, in_h, in_w)).astype(np.float32)
        packs.append(pack_rgb(jnp.asarray(img)).reshape(in_h, in_w))

    refs = [
        pallas_remap_apply_batched(
            jnp.stack([p, p]), bp, interpret=True
        )
        for p in packs
    ]
    got = pallas_remap_apply_batched(
        jnp.stack([jnp.stack([p, p]) for p in packs]),
        bp,
        interpret=True,
        frames_axis=True,
    )
    for i in range(2):
        assert got[i].shape == (B, 3, 64, 256)
        for b in range(B):
            np.testing.assert_array_equal(
                np.asarray(got[i][b]), np.asarray(refs[b][i])
            )


def test_pallas_remap_frames_axis_paired_nc1():
    """frames_axis with the production paired nc=1 (Y-fan) layout."""
    rng = np.random.default_rng(11)
    in_h, in_w = 96, 256
    m1, m2 = _arc_maps(64, 256)
    from octvr_tpu.ops.pallas_remap import pack_pairs

    bp = merge_remap_plans([(m1, m2)], in_h, in_w, paired=True)
    B = 2
    packs = [
        pack_pairs(
            [jnp.asarray(rng.integers(0, 256, (in_h, in_w)), jnp.int32)]
        )
        for _ in range(B)
    ]
    refs = [
        pallas_remap_apply_batched(
            p[None], bp, interpret=True, nc=1, paired=True
        )[0]
        for p in packs
    ]
    got = pallas_remap_apply_batched(
        jnp.stack([p[None] for p in packs]),
        bp,
        interpret=True,
        nc=1,
        paired=True,
        frames_axis=True,
    )[0]
    for b in range(B):
        np.testing.assert_array_equal(np.asarray(got[b]), np.asarray(refs[b]))
