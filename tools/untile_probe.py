#!/usr/bin/env python
"""Probe untile variants for the remap kernel's grid-order -> canvas
relayout (the ~2 ms "untile/take framework" cost isolated by
tools/floor_probe.py, docs/kernel-notes.md round-3 floor analysis).

The production untile (ops/pallas_remap.py) is
    take(g2c) + where(tmask) + per-camera reshape/transpose/reshape
and the transpose is a genuine relayout: kernel tiles are (8,128)
contiguous while bf16 canvas arrays tile physically at (16,128), so the
(nty, ntx, 8, 128) -> (nty, 8, ntx, 128) swap crosses physical tiles.

Variants measured on the production 4K 6-cam Y plan (all SIX cameras
value-synced as jit outputs — note floor_probe's untile row returned
only camera 0, letting XLA DCE the other five):

  v0        production: take + where + per-cam transpose chain
  v0_nw     v0 without the where pass (tmask folded away)
  v1        ONE row-granularity gather per camera directly into
            (nty*ph, ntx, pw) + free reshape — no transpose, dropped
            tiles point at an appended zero tile
  v2        take + where only (no per-cam transpose) — gather floor
  passthru  reshape-only floor (framework overhead)

If v1 beats v0 by >~0.5 ms it is worth plumbing into the product path
(bit-exact: same values, different relayout route).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import CAM  # noqa: E402

from octvr_tpu.ops.pallas_remap import TH, TW  # noqa: E402
from octvr_tpu.stitch import Mapper  # noqa: E402
from tools.fan_sweep import get_template  # noqa: E402

ITERS = 16


def sync(x):
    return float(jnp.sum(x[..., :4, :4].astype(jnp.float32)))


def timeit(name, fn, *args):
    fn2 = jax.jit(fn)
    out = fn2(*args)
    sync(out[0])
    t0 = time.time()
    for _ in range(ITERS):
        out = fn2(*args)
    sync(out[0])
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:7.2f} ms")
    return dt


def variants(rp, dtype):
    """Build the jit-able variant fns for one batched plan."""
    g2c_np = np.asarray(rp.g2c)
    tmask_np = np.asarray(rp.tmask)

    def cam_geo(i):
        rh, rw = rp.out_shapes[i]
        ph, pw = rp.patches[i]
        ntx = -(-rw // pw)
        nty = -(-rh // ph)
        return rh, rw, ph, pw, nty, ntx, rp.tile_offsets[i]

    def v0(tiles):
        g2c = jnp.asarray(g2c_np)
        tm = jnp.asarray(tmask_np)[:, None, None] > 0
        ch = jnp.where(tm, jnp.take(tiles, g2c, axis=0), jnp.zeros((), dtype))
        outs = []
        for i in range(len(rp.out_shapes)):
            rh, rw, ph, pw, nty, ntx, start = cam_geo(i)
            outs.append(
                ch[start : start + nty * ntx]
                .reshape(nty, ntx, ph, pw)
                .transpose(0, 2, 1, 3)
                .reshape(nty * ph, ntx * pw)[:rh, :rw]
            )
        return outs

    def v0_nw(tiles):
        g2c = jnp.asarray(g2c_np)
        ch = jnp.take(tiles, g2c, axis=0)
        outs = []
        for i in range(len(rp.out_shapes)):
            rh, rw, ph, pw, nty, ntx, start = cam_geo(i)
            outs.append(
                ch[start : start + nty * ntx]
                .reshape(nty, ntx, ph, pw)
                .transpose(0, 2, 1, 3)
                .reshape(nty * ph, ntx * pw)[:rh, :rw]
            )
        return outs

    # v1: per-camera row-granularity gather.  Row unit = the patch
    # width pw (a (ph,pw) patch flattens row-major into the (8,128)
    # tile, so patch row r is one contiguous pw-chunk).  Dropped tiles
    # index the appended zero tile.
    v1_idx = []
    for i in range(len(rp.out_shapes)):
        rh, rw, ph, pw, nty, ntx, start = cam_geo(i)
        rpt = TH * TW // pw  # rows (pw-chunks) per tile == ph
        tile_id = start + np.arange(nty * ntx).reshape(nty, ntx)
        g = g2c_np[tile_id]
        dropped = tmask_np[tile_id] <= 0
        # [nty, ph, ntx]: canvas row n*ph+r, column chunk x
        idx = (
            g[:, None, :] * rpt
            + np.arange(ph, dtype=np.int64)[None, :, None]
        )
        zero_base = (g2c_np.max() + 1) * rpt
        idx = np.where(dropped[:, None, :], zero_base, idx)
        v1_idx.append(jnp.asarray(idx.reshape(-1).astype(np.int32)))

    nslot = int(g2c_np.max() + 1)

    def v1(tiles):
        padded = jnp.concatenate(
            [tiles[:nslot], jnp.zeros((1, TH, TW), dtype)], axis=0
        )
        outs = []
        for i in range(len(rp.out_shapes)):
            rh, rw, ph, pw, nty, ntx, start = cam_geo(i)
            flat = padded.reshape(-1, pw)
            out = (
                jnp.take(flat, v1_idx[i], axis=0)
                .reshape(nty * ph, ntx * pw)[:rh, :rw]
            )
            outs.append(out)
        return outs

    def v2(tiles):
        g2c = jnp.asarray(g2c_np)
        tm = jnp.asarray(tmask_np)[:, None, None] > 0
        ch = jnp.where(tm, jnp.take(tiles, g2c, axis=0), jnp.zeros((), dtype))
        return [ch]

    def passthru(tiles):
        return [tiles.reshape(-1, TW) * 1]

    return v0, v0_nw, v1, v2, passthru


def check_parity(rp, dtype):
    v0, _, v1, _, _ = variants(rp, dtype)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(
        rng.standard_normal((rp.grid_nt * rp.G, TH, TW)).astype(np.float32)
    ).astype(dtype)
    a = jax.jit(v0)(tiles)
    b = jax.jit(v1)(tiles)
    for i, (x, y) in enumerate(zip(a, b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    print(f"v1 bit-exact vs v0 across {len(a)} cameras")


def in_context(rp_y, rp_uv):
    """The decisive rows: the REAL kernel with the untile chain, with
    take-only, and raw — the deltas are the untile's in-context cost
    (the isolated rows below are dispatch-floor-bound: even a reshape
    passthru costs ~2-3 ms per call through the tunnel)."""
    from octvr_tpu.ops.pallas_remap import (
        pack_pairs,
        pallas_remap_apply_batched,
    )

    rng = np.random.default_rng(0)
    pk_y = jnp.stack(
        [
            pack_pairs(
                [jnp.asarray(rng.integers(0, 255, (CAM, CAM), dtype=np.int32))]
            )
            for _ in range(6)
        ]
    )
    pk_uv = jnp.stack(
        [
            pack_pairs(
                [
                    jnp.asarray(
                        rng.integers(
                            0, 255, (CAM // 2, CAM // 2), dtype=np.int32
                        )
                    ),
                    jnp.asarray(
                        rng.integers(
                            0, 255, (CAM // 2, CAM // 2), dtype=np.int32
                        )
                    ),
                ]
            )
            for _ in range(6)
        ]
    )
    jax.block_until_ready((pk_y, pk_uv))

    res = {}
    for nm, pk, rp, nc in (("Y", pk_y, rp_y, 1), ("UV", pk_uv, rp_uv, 2)):
        for stage in (None, "take", "raw"):
            label = stage or "full"

            def run(x, rp=rp, nc=nc, stage=stage):
                return pallas_remap_apply_batched(
                    x, rp, out_dtype="bfloat16", nc=nc, paired=True,
                    _probe_stage=stage,
                )

            res[(nm, label)] = timeit(f"{nm} kernel + {label}", run, pk)
    for nm in ("Y", "UV"):
        f, t, r = (res[(nm, k)] for k in ("full", "take", "raw"))
        print(
            f"{nm}: in-context untile chain = {f - r:+.2f} ms "
            f"(take {t - r:+.2f}, transpose/residual {f - t:+.2f})"
        )


def main():
    mt = get_template()
    mapper = Mapper(mt, [(CAM, CAM)] * 6, blend=128, enable_gain=True)
    plan = mapper.plan
    rp_y = plan.batched_remap or max(plan.remap_y_groups, key=lambda p: p.nt)
    rp_uv = plan.remap_uv or max(plan.remap_uv_groups, key=lambda p: p.nt)
    dtype = jnp.bfloat16

    in_context(rp_y, rp_uv)
    for nm, rp in (("Y", rp_y), ("UV", rp_uv)):
        print(
            f"{nm} plan: nt={rp.nt} grid={rp.grid_nt} G={rp.G} "
            f"patches={rp.patches}"
        )
        check_parity(rp, dtype)
        tiles = jnp.zeros((rp.grid_nt * rp.G, TH, TW), dtype)
        jax.block_until_ready(tiles)
        v0, v0_nw, v1, v2, passthru = variants(rp, dtype)
        timeit(f"{nm} v0 production (take+where+transpose)", v0, tiles)
        timeit(f"{nm} v0_nw (no where)", v0_nw, tiles)
        timeit(f"{nm} v1 row-gather direct", v1, tiles)
        timeit(f"{nm} v2 take+where only", v2, tiles)
        timeit(f"{nm} passthru floor", passthru, tiles)


if __name__ == "__main__":
    main()
