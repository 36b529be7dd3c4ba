#!/usr/bin/env python
"""Decompose the remap fan's per-frame cost on the real chip.

Measures, for the production yuv420 paired fans of the 4K 6-cam bench
template:

  full      — the real kernel + untile/take framework
  empty     — same compiled structure with zeroed row ranges: the fan
              loops run zero iterations, so this is per-step fixed cost
              (DMA issues, scalar reads, store) + the untile framework
  untile    — the XLA take/where/untile chain alone on same-shape data

  fan compute ~ full - empty;  per-step fixed ~ empty - untile

Also reports the plan's chunk-row visit count and the useful-work ratio
(2 contributing source rows per output pixel vs rows actually visited)
— the row fan's structural ALU efficiency.

Context (docs/kernel-notes.md): every structural knob measured flat in
round 3 — G in {6,8,12}, CHUNK in {8,16,32}, interleaved accumulators
{1,2,4}, row-packing, quad-packing.  This probe pins down what the
remaining milliseconds actually are.
"""

import dataclasses
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

from octvr_tpu.ops.pallas_remap import (  # noqa: E402
    TH,
    TW,
    pack_pairs,
    pallas_remap_apply_batched,
)
from octvr_tpu.stitch import Mapper  # noqa: E402
from tools.fan_sweep import get_template  # noqa: E402

ITERS = 12


def sync(x):
    return float(jnp.sum(x[..., :8, :8].astype(jnp.float32)))


def timeit(name, fn, *args):
    fn2 = jax.jit(fn)
    out = fn2(*args)
    sync(out if isinstance(out, jnp.ndarray) else out[0])
    t0 = time.time()
    for _ in range(ITERS):
        out = fn2(*args)
    sync(out if isinstance(out, jnp.ndarray) else out[0])
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:34s} {dt:7.2f} ms")
    return dt


def visits(plan):
    """Chunk-rounded fan row visits per frame (what the kernel executes)
    and the ideal 2-rows-per-pixel useful count."""
    from octvr_tpu.ops.pallas_remap import fan_chunk

    rng = np.asarray(plan.rng).reshape(-1)
    KH = plan.KH
    CHUNK = fan_chunk(KH)
    lo = rng & 0xFFFF
    hi = rng >> 16
    total = 0
    for base in (0, KH):
        l = np.maximum(lo, base) - base
        h = np.minimum(hi, base + KH) - base
        n = np.maximum(0, -(-(h - l) // CHUNK))
        sel = h > l
        total += int((n[sel]).sum()) * CHUNK
    # the paired fan ranges are per (step*G, block); each visit is one
    # (8,128) gather + ~12 vector ops
    useful = 2 * plan.nt  # tiles x (2 rows/px, in tile-row units)
    return total, CHUNK


def main():
    mt = get_template()
    mapper = Mapper(mt, [(CAM, CAM)] * 6, blend=128, enable_gain=True)
    plan = mapper.plan
    # largest window-class group of each fan (plans may be split by
    # window class; see merge_remap_plans_window_groups)
    rp_y = plan.batched_remap or max(
        plan.remap_y_groups, key=lambda p: p.nt
    )
    rp_uv = plan.remap_uv or max(
        plan.remap_uv_groups, key=lambda p: p.nt
    )
    print(
        f"Y plan: nt={rp_y.nt} grid={rp_y.grid_nt} G={rp_y.G} "
        f"KH={rp_y.KH} KW={rp_y.KW}"
    )
    print(
        f"UV plan: nt={rp_uv.nt} grid={rp_uv.grid_nt} G={rp_uv.G} "
        f"KH={rp_uv.KH} KW={rp_uv.KW}"
    )
    for nm, rp in (("Y", rp_y), ("UV", rp_uv)):
        v, chunk = visits(rp)
        px = rp.nt * TH * TW
        print(
            f"{nm}: chunk-rounded row visits/frame = {v:,} (CHUNK={chunk}); "
            f"output px = {px:,}; visited (8,128)-rows per output tile = "
            f"{v / rp.nt:.1f}"
        )

    rng = np.random.default_rng(0)
    y_planes = [
        jnp.asarray(rng.integers(0, 255, (CAM, CAM), dtype=np.int32))
        for _ in range(6)
    ]
    uv_planes = [
        (
            jnp.asarray(
                rng.integers(0, 255, (CAM // 2, CAM // 2), dtype=np.int32)
            ),
            jnp.asarray(
                rng.integers(0, 255, (CAM // 2, CAM // 2), dtype=np.int32)
            ),
        )
        for _ in range(6)
    ]
    pk_y = jnp.stack([pack_pairs([p]) for p in y_planes])
    pk_uv = jnp.stack([pack_pairs([u, v]) for (u, v) in uv_planes])
    jax.block_until_ready((pk_y, pk_uv))

    def run_y(x, rp=rp_y):
        return pallas_remap_apply_batched(
            x, rp, out_dtype="bfloat16", nc=1, paired=True
        )[0]

    def run_uv(x, rp=rp_uv):
        return pallas_remap_apply_batched(
            x, rp, out_dtype="bfloat16", nc=2, paired=True
        )[0]

    t_full_y = timeit("Y fan full", run_y, pk_y)
    t_full_uv = timeit("UV fan full", run_uv, pk_uv)

    # emptied row ranges: fan loops run zero iterations
    empty_y = dataclasses.replace(rp_y, rng=np.zeros_like(np.asarray(rp_y.rng)))
    empty_uv = dataclasses.replace(
        rp_uv, rng=np.zeros_like(np.asarray(rp_uv.rng))
    )
    t_empty_y = timeit(
        "Y fan EMPTY ranges (fixed+frame)",
        lambda x: run_y(x, rp=empty_y), pk_y,
    )
    t_empty_uv = timeit(
        "UV fan EMPTY ranges (fixed+frame)",
        lambda x: run_uv(x, rp=empty_uv), pk_uv,
    )

    # the untile framework alone: grid-ordered tiles -> canvas layout
    def untile_only(tiles, rp=rp_y):
        g2c = jnp.asarray(rp.g2c)
        tm = jnp.asarray(rp.tmask)[:, None, None] > 0
        ch = jnp.where(
            tm,
            jnp.take(tiles.reshape(-1, TH, TW), g2c, axis=0),
            jnp.zeros((), tiles.dtype),
        )
        outs = []
        for i, (rh, rw) in enumerate(rp.out_shapes):
            ph, pw = rp.patches[i]
            ntx = -(-rw // pw)
            nty = -(-rh // ph)
            start = rp.tile_offsets[i]
            outs.append(
                ch[start : start + nty * ntx]
                .reshape(nty, ntx, ph, pw)
                .transpose(0, 2, 1, 3)
                .reshape(nty * ph, ntx * pw)[:rh, :rw]
            )
        return outs[0]

    dummy = jnp.zeros((rp_y.grid_nt * rp_y.G, TH, TW), jnp.bfloat16)
    t_untile = timeit("Y untile/take framework alone", untile_only, dummy)

    print("\nDecomposition (Y):")
    print(f"  fan compute  ~ {t_full_y - t_empty_y:6.2f} ms")
    print(f"  per-step fix ~ {t_empty_y - t_untile:6.2f} ms")
    print(f"  untile/take  ~ {t_untile:6.2f} ms")
    print(f"UV: compute ~ {t_full_uv - t_empty_uv:.2f} ms, "
          f"fixed+frame ~ {t_empty_uv:.2f} ms")


if __name__ == "__main__":
    main()
