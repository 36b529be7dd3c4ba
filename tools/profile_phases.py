#!/usr/bin/env python
"""Per-phase timing of the 4K 6-cam stitch on the real chip.

Each phase is jitted separately with device-resident inputs and
value-synced (see docs/kernel-notes.md for why plain block_until_ready
is not a sync on the hosted tunnel).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache_dir = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from bench import CAM, CANVAS_H, CANVAS_W, six_cam_rig  # noqa: E402

from octvr_tpu.ops.color import rgb_planar_to_yuv420p, yuv420p_to_rgb_planar
from octvr_tpu.ops.pallas_remap import pallas_remap_apply_batched
from octvr_tpu.ops.remap import pack_rgb
from octvr_tpu.stitch import Mapper
from octvr_tpu.stitch.blenders import multiband_blend
from octvr_tpu.stitch.gain import solve_gains
from octvr_tpu.template import compile_rig

ITERS = 12


def timeit(name, fn, *args):
    try:
        return _timeit(name, fn, *args)
    except Exception as e:  # keep profiling the remaining phases
        # NOTE: phase_gain standalone has crashed the hosted TPU worker
        # when fed another program's pallas outputs; the same code inside
        # the full stitch program runs fine (see bench.py results)
        print(f"{name:30s} FAILED: {type(e).__name__}")
        return None


def _timeit(name, fn, *args):
    out = fn(*args)  # compile
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "shape")]
    _ = float(jnp.sum(leaves[-1].astype(jnp.float32).ravel()[::1013]))
    t0 = time.time()
    outs = [fn(*args) for _ in range(ITERS)]
    leaves = [
        x for x in jax.tree_util.tree_leaves(outs[-1]) if hasattr(x, "shape")
    ]
    _ = float(jnp.sum(leaves[-1].astype(jnp.float32).ravel()[::1013]))
    dt = (time.time() - t0) / ITERS * 1e3
    print(f"{name:30s} {dt:8.2f} ms")
    return out


def main():
    rig = six_cam_rig()
    mt = compile_rig(rig, CANVAS_W, CANVAS_H)
    mt.create_masks()
    sizes = [(CAM, CAM)] * 6
    mapper = Mapper(mt, sizes, blend=128, enable_gain=True)
    plan = mapper._plan_dev

    rng = np.random.default_rng(0)
    bufs = tuple(
        jax.device_put(
            rng.integers(0, 255, (CAM * 3 // 2, CAM), dtype=np.uint8)
        )
        for _ in range(6)
    )

    # phase 1: color + vignette + pack (all 6)
    @jax.jit
    def phase_color(plan, bufs):
        packed = []
        for buf, ip in zip(bufs, plan.inputs):
            rgb = yuv420p_to_rgb_planar(
                buf, up_cols=plan.chroma_up.get(buf.shape[1])
            )
            if ip.vignette is not None:
                rgb = jnp.clip(rgb * jnp.asarray(ip.vignette)[None], 0.0, 255.0)
            p = pack_rgb(rgb)
            packed.append(p.reshape(rgb.shape[1], rgb.shape[2]))
        return jnp.stack(packed)

    packed = timeit("color+vignette+pack x6", phase_color, plan, bufs)

    # phase 2: batched pallas remap
    @jax.jit
    def phase_remap(plan, packed):
        return pallas_remap_apply_batched(packed, plan.batched_remap)

    warped = timeit("pallas remap (6 cams)", phase_remap, plan, packed)

    # phase 3: working-scale strided subsample of warped + gain solve
    @jax.jit
    def phase_gain(plan, warped):
        norms = []
        for w, ip in zip(warped, plan.inputs):
            oy, ox, s, wh, ww = ip.work_sub
            wimg = w[:, oy::s, ox::s][:, :wh, :ww]
            norms.append(jnp.sqrt(jnp.sum(wimg * wimg, axis=0)))
        return solve_gains(plan.gain, norms)

    gains = timeit("gain (subsample + solve)", phase_gain, plan, list(warped))
    if gains is None:
        gains = jnp.ones((len(plan.inputs),), jnp.float32)

    # phase 4: multiband blend
    @jax.jit
    def phase_blend(plan, warped, gains):
        imgs = [w * gains[i] for i, w in enumerate(warped)]
        return multiband_blend(plan.blender, imgs, plan.canvas_size)

    canvas = timeit("multiband blend (6 bands)", phase_blend, plan, list(warped), gains)
    if canvas is None:
        canvas = jnp.zeros((3, CANVAS_H, CANVAS_W), jnp.float32)

    # phase 5: output color conversion
    @jax.jit
    def phase_out(canvas):
        return rgb_planar_to_yuv420p(jnp.clip(canvas, 0.0, 255.0))

    timeit("rgb->yuv420p out", phase_out, canvas)

    # end to end for comparison
    timeit("END TO END (rgb)", mapper._stitch_auto, plan, bufs)

    # ---- yuv420-native pipeline phases (the bench default)
    m2 = Mapper(
        mt,
        sizes,
        blend=128,
        enable_gain=True,
        blend_dtype="bfloat16",
        pipeline="yuv420",
    )
    p2 = m2._plan_dev

    from octvr_tpu.ops.pallas_remap import pack_pairs

    @jax.jit
    def phase_y(plan, bufs):
        from octvr_tpu.ops.color import split_yuv420p

        packs = []
        for buf, ip in zip(bufs, plan.inputs):
            y, _, _ = split_yuv420p(buf)
            yf = y.astype(jnp.float32)
            if ip.vignette is not None:
                yf = jnp.clip(yf * jnp.asarray(ip.vignette), 0.0, 255.0)
            yq = jnp.clip(jnp.round(yf), 0, 255).astype(jnp.int32)
            packs.append(pack_pairs([yq]))
        return pallas_remap_apply_batched(
            jnp.stack(packs),
            plan.batched_remap,
            out_dtype="bfloat16",
            nc=1,
            paired=True,
        )

    timeit("Y pack + 1-ch paired remap x6", phase_y, p2, bufs)

    @jax.jit
    def phase_uv(plan, bufs):
        from octvr_tpu.ops.color import split_yuv420p

        packs = []
        for buf, ip in zip(bufs, plan.inputs):
            _, u, v = split_yuv420p(buf)
            uf = u.astype(jnp.float32)
            vf = v.astype(jnp.float32)
            if ip.vig_half is not None:
                vh = jnp.asarray(ip.vig_half)
                uf = jnp.clip((uf - 128.0) * vh + 128.0, 0.0, 255.0)
                vf = jnp.clip((vf - 128.0) * vh + 128.0, 0.0, 255.0)
            uq = jnp.clip(jnp.round(uf), 0, 255).astype(jnp.int32)
            vq = jnp.clip(jnp.round(vf), 0, 255).astype(jnp.int32)
            packs.append(pack_pairs([uq, vq]))
        return pallas_remap_apply_batched(
            jnp.stack(packs),
            plan.remap_uv,
            out_dtype="bfloat16",
            nc=2,
            paired=True,
        )

    timeit("UV pack + 2-ch paired half-res remap", phase_uv, p2, bufs)
    timeit("END TO END (yuv420)", m2._stitch_auto, p2, bufs)


if __name__ == "__main__":
    main()
