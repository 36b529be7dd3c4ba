"""The remap gather — the per-frame hot op.

TPU-first design: the maps are *static per template*, so all bilinear
arithmetic (neighbor indices + weights) is precomputed offline into a
``RemapPlan``; the online op is four flat gathers + fused multiply-add,
which XLA fuses into a single pass over the output.  This replaces the
reference's texture-unit kernel (cudawarping/src/cuda/fast_remap.cu:19-56:
normalized coords, hardware bilinear, negative map -> zero fill).

Images flow planar [C, H, W] (channel-major keeps the gathered axis the
trailing/lane axis on TPU).
"""

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..utils.pytree import register_plan

__all__ = ["RemapPlan", "remap_apply", "remap_plan"]


@dataclass(frozen=True)
class RemapPlan:
    """Precomputed gather indices/weights for one (map, input-size) pair.

    idx:  int32 [4, rh*rw]  flat indices into the input plane (y*W + x)
    w:    f32   [4, rh*rw]  bilinear weights (0 where the map is invalid)
    out_shape: (rh, rw)
    in_shape:  (H, W)
    """

    idx: object
    w: object
    out_shape: tuple
    in_shape: tuple


register_plan(RemapPlan, children=("idx", "w"), static=("out_shape", "in_shape"))


def remap_plan(map1: np.ndarray, map2: np.ndarray, in_h: int, in_w: int) -> RemapPlan:
    """Build the gather plan from normalized maps (f32 [rh, rw], -1 where
    invalid).  Sampling matches the reference texture path: pixel coords
    px = mapx * W - 0.5 with clamp-to-edge."""
    rh, rw = map1.shape
    px = map1.astype(np.float64) * in_w - 0.5
    py = map2.astype(np.float64) * in_h - 0.5
    invalid = map1 < 0

    x0 = np.floor(px)
    y0 = np.floor(py)
    fx = (px - x0).astype(np.float32)
    fy = (py - y0).astype(np.float32)
    x0 = np.clip(x0, 0, in_w - 1).astype(np.int32)
    y0 = np.clip(y0, 0, in_h - 1).astype(np.int32)
    x1 = np.minimum(x0 + 1, in_w - 1)
    y1 = np.minimum(y0 + 1, in_h - 1)

    idx = np.stack(
        [
            y0 * in_w + x0,
            y0 * in_w + x1,
            y1 * in_w + x0,
            y1 * in_w + x1,
        ]
    ).reshape(4, -1)
    w = np.stack(
        [
            (1 - fx) * (1 - fy),
            fx * (1 - fy),
            (1 - fx) * fy,
            fx * fy,
        ]
    ).reshape(4, -1)
    w[:, invalid.reshape(-1)] = 0.0
    idx[:, invalid.reshape(-1)] = 0
    return RemapPlan(
        idx=idx, w=w.astype(np.float32), out_shape=(rh, rw), in_shape=(in_h, in_w)
    )


def remap_apply(img, plan: RemapPlan):
    """img: f32 [C, H, W] -> warped f32 [C, rh, rw].

    Invalid map positions produce exact 0 (fill_zero semantics of
    fast_remap.cu:31-35).  Generic/reference path; the hot path is
    pack_rgb + remap_apply_packed below."""
    c = img.shape[0]
    flat = img.reshape(c, -1)
    idx = jnp.asarray(plan.idx)
    w = jnp.asarray(plan.w)
    out = jnp.zeros((c, idx.shape[1]), dtype=img.dtype)
    for k in range(4):
        out = out + jnp.take(flat, idx[k], axis=1) * w[k][None, :]
    return out.reshape(c, *plan.out_shape)


def pack_rgb(rgb):
    """f32 [3, H, W] in [0,255] -> packed int32 [H*W] (8 bits/channel).

    TPU gather cost scales with the *index count*, not bytes: packing three
    channels into one int32 makes the 4-tap bilinear gather ~16x faster
    than gathering [3, N] planes (measured on v5e).  Quantizing to 8 bits
    before the gather matches the reference, which remaps 8-bit RGBA
    (fast_remap.cu:19)."""
    q = jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.int32)
    return (q[0] | (q[1] << 8) | (q[2] << 16)).reshape(-1)


def remap_apply_packed(packed, plan: RemapPlan):
    """packed: int32 [H*W] from pack_rgb -> warped f32 [3, rh, rw]."""
    idx = jnp.asarray(plan.idx)
    w = jnp.asarray(plan.w)
    n = idx.shape[1]
    out = jnp.zeros((3, n), dtype=jnp.float32)
    for k in range(4):
        g = jnp.take(packed, idx[k])
        chans = jnp.stack(
            [
                (g & 0xFF).astype(jnp.float32),
                ((g >> 8) & 0xFF).astype(jnp.float32),
                ((g >> 16) & 0xFF).astype(jnp.float32),
            ]
        )
        out = out + chans * w[k][None, :]
    return out.reshape(3, *plan.out_shape)


# ---------------------------------------------------------------------------
# Performance notes (v5e, measured):
#  * XLA element gather: ~0.15-0.6 G elements/s -- the remap hot-op limiter.
#  * Packing RGB into one int32 (pack_rgb) cuts index count 3x vs [3, N].
#  * 128-lane row gather is ~17x faster per pixel than element gather; a
#    Pallas kernel that DMAs per-tile input windows and interpolates via
#    row-select fans (take_along_axis works on single (8,128) tiles in
#    Mosaic) is the planned speed-of-light path -- see docs/kernel-notes.md.
