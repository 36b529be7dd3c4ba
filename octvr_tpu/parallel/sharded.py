"""Multi-chip sharded stitching.

TPU-native scaling design (SURVEY.md §2.5/§5): a 2-D device mesh
``('data', 'space')`` —

* ``data``: frame-level data parallelism (each chip stitches different
  frames of the stream; linear throughput scaling for video).
* ``space``: spatial tensor parallelism — the output canvas is split into
  horizontal row *bands*, one per chip.  Each band is extended by a halo
  of ``5 * 2^bands`` rows (the reference's multiband alignment gap,
  blenders.cpp:625-640, which is exactly the support needed for the blend
  pyramid); halo rows are *recomputed* on both neighbors instead of
  exchanged — remap is pure per-pixel gather, so recompute is cheaper
  than an ICI round-trip.  The only cross-chip communication is a psum
  of the tiny exposure-gain sums (one [2P] vector per frame).

Inputs are replicated across 'space' (every chip gathers from the full
camera frames); the per-shard gather tables, blend weights and masks are
*sharded constants* carried on the leading S axis.
"""

import math
from dataclasses import dataclass, field
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.color import yuv420p_to_rgb_planar
from ..ops.pyramid import pyr_down, pyr_up
from ..ops.remap import remap_plan
from ..ops.resize import resize_bilinear
from ..stitch.blenders import WEIGHT_EPS
from ..stitch.gain import ALPHA, BETA
from ..template.compiler import MapperTemplate
from ..utils.pytree import register_plan
from scipy.ndimage import distance_transform_edt

__all__ = ["ShardedMapper", "ShardedPlan", "make_mesh"]


def make_mesh(n_data: int, n_space: int, devices=None):
    devices = devices if devices is not None else jax.devices()
    assert n_data * n_space <= len(devices)
    dev = np.array(devices[: n_data * n_space]).reshape(n_data, n_space)
    return Mesh(dev, axis_names=("data", "space"))


@dataclass
class ShardedPlan:
    # static geometry
    num_inputs: int
    S: int
    bh: int  # band height (canvas rows per shard)
    halo: int
    ext: int  # bh + 2*halo
    Hp: int  # padded canvas height (S * bh)
    Wp: int  # padded canvas width
    canvas_size: tuple  # true (W, H)
    blend_kind: str
    num_bands: int
    N: tuple  # gain pair counts, nested tuple
    pairs: tuple
    # sharded constants, leading axis S
    idx: object = None  # [S, ncam, 4, ext*Wp] int32
    w: object = None  # [S, ncam, 4, ext*Wp] f32
    feather_w: object = None  # [S, ncam, ext, Wp] f32
    weight_pyrs: Optional[List] = None  # per level: [S, ncam, ext>>l, Wp>>l]
    band_weights: Optional[List] = None  # per level: [S, ext>>l, Wp>>l]
    pair_bits: object = None  # [S, bh, Wp] int32 bitmask of gain pairs
    # replicated constants
    vignette: object = None  # [ncam, Hf, Wf] f32 (ones if unused)
    gain_b: object = None  # [ncam] f32
    gain_A_static: object = None  # [ncam, ncam] f32


register_plan(
    ShardedPlan,
    children=(
        "idx",
        "w",
        "feather_w",
        "weight_pyrs",
        "band_weights",
        "pair_bits",
        "vignette",
        "gain_b",
        "gain_A_static",
    ),
    static=(
        "num_inputs",
        "S",
        "bh",
        "halo",
        "ext",
        "Hp",
        "Wp",
        "canvas_size",
        "blend_kind",
        "num_bands",
        "N",
        "pairs",
    ),
)


def _round_up(v, m):
    return (v + m - 1) // m * m


def _full_canvas_maps(mt: MapperTemplate, Hp, Wp):
    """Paste each input's ROI maps into padded full-canvas maps (-1 =
    invalid)."""
    maps = []
    for inp in mt.inputs:
        m1 = np.full((Hp, Wp), -1.0, dtype=np.float32)
        m2 = np.full((Hp, Wp), -1.0, dtype=np.float32)
        x, y, w, h = inp.roi
        m1[y : y + h, x : x + w] = inp.map1
        m2[y : y + h, x : x + w] = inp.map2
        maps.append((m1, m2))
    return maps


def build_sharded_plan(
    mt: MapperTemplate,
    in_sizes,
    n_space: int,
    blend: int = 128,
    enable_gain: bool = True,
) -> ShardedPlan:
    W, H = mt.out_size
    ncam = len(mt.inputs)
    sizes = set(tuple(s) for s in in_sizes)
    assert len(sizes) == 1, "sharded path requires equal camera sizes"
    Hf, Wf = in_sizes[0]

    if blend > 0:
        B = int(math.ceil(math.log(blend) / math.log(2.0)) - 1.0)
        kind = "multiband"
    elif blend < 0:
        B = 0
        kind = "feather"
    else:
        B = 0
        kind = "none"
    step = 1 << max(B, 1)
    Hp = _round_up(H, n_space * step)
    Wp = _round_up(W, step)
    bh = Hp // n_space
    halo = 5 * (1 << B) if kind == "multiband" else 8
    # halo must stay a multiple of 2^B for level alignment
    ext = bh + 2 * halo
    S = n_space

    maps = _full_canvas_maps(mt, Hp, Wp)

    def band_slice(arr, s, level=0, pad_value=0.0):
        """Rows of the extended band s from a full padded array at pyramid
        level ``level`` (``pad_value``-padded outside the canvas)."""
        h_l = halo >> level
        bh_l = bh >> level
        top = s * bh_l - h_l
        pad = np.full((h_l,) + arr.shape[1:], pad_value, dtype=arr.dtype)
        big = np.concatenate([pad, arr, pad], axis=0)
        return big[top + h_l : top + h_l + bh_l + 2 * h_l]

    # ---- remap gather tables per shard
    idx_all, w_all = [], []
    for s in range(S):
        idx_cam, w_cam = [], []
        for (m1, m2) in maps:
            b1 = band_slice(m1, s, pad_value=-1.0)
            b2 = band_slice(m2, s, pad_value=-1.0)
            rp = remap_plan(b1, b2, Hf, Wf)
            idx_cam.append(rp.idx)
            w_cam.append(rp.w)
        idx_all.append(np.stack(idx_cam))
        w_all.append(np.stack(w_cam))
    idx_arr = np.stack(idx_all)  # [S, ncam, 4, ext*Wp]
    w_arr = np.stack(w_all)

    plan = ShardedPlan(
        num_inputs=ncam,
        S=S,
        bh=bh,
        halo=halo,
        ext=ext,
        Hp=Hp,
        Wp=Wp,
        canvas_size=(W, H),
        blend_kind=kind,
        num_bands=B,
        N=(),
        pairs=(),
        idx=idx_arr,
        w=w_arr,
    )

    # ---- full-canvas masks (u8) per input
    full_masks = []
    for inp in mt.inputs:
        fm = np.zeros((Hp, Wp), dtype=np.uint8)
        x, y, w_, h_ = inp.roi
        fm[y : y + h_, x : x + w_] = inp.mask
        full_masks.append(fm)

    # ---- blend constants
    if kind == "feather":
        border = -blend
        dst = np.full((Hp, Wp), WEIGHT_EPS, dtype=np.float32)
        raw = []
        for fm in full_masks:
            wmap = distance_transform_edt(fm > 0).astype(np.float32) - border
            np.maximum(wmap, 0.0, out=wmap)
            raw.append(wmap)
            dst += wmap
        norm = [wm / dst for wm in raw]
        plan.feather_w = np.stack(
            [np.stack([band_slice(wm, s) for wm in norm]) for s in range(S)]
        )
    elif kind == "multiband":
        full_seams = []
        for inp, sm in zip(mt.inputs, mt.seam_masks):
            fs = np.zeros((Hp, Wp), dtype=np.float32)
            x, y, w_, h_ = inp.roi
            fs[y : y + h_, x : x + w_] = sm.astype(np.float32) / 255.0
            full_seams.append(fs)
        from ..stitch.blenders import np_pyr_down

        pyrs = []  # [ncam][level] full-canvas weight pyramids
        for fs in full_seams:
            pyr = [fs]
            for _ in range(B):
                pyr.append(np_pyr_down(pyr[-1]))
            pyrs.append(pyr)
        bw = [
            np.sum([p[l] for p in pyrs], axis=0) + WEIGHT_EPS
            for l in range(B + 1)
        ]
        plan.weight_pyrs = [
            np.stack(
                [
                    np.stack([band_slice(p[l], s, level=l) for p in pyrs])
                    for s in range(S)
                ]
            )
            for l in range(B + 1)
        ]
        plan.band_weights = [
            np.stack([band_slice(bw[l], s, level=l) for s in range(S)])
            # guard: padded halo rows outside the canvas have weight 0 ->
            # they were initialized with eps inside the canvas only
            for l in range(B + 1)
        ]
        for l in range(B + 1):
            plan.band_weights[l] = np.maximum(plan.band_weights[l], WEIGHT_EPS)

    # ---- gain constants (full-resolution band sums, psum over 'space')
    if enable_gain and ncam > 1:
        pairs = []
        N = np.zeros((ncam, ncam), dtype=np.int64)
        bits = np.zeros((Hp, Wp), dtype=np.int32)
        for i in range(ncam):
            N[i, i] = max(1, int(np.count_nonzero(full_masks[i])))
        p = 0
        for i in range(ncam):
            for j in range(i + 1, ncam):
                inter = (full_masks[i] > 0) & (full_masks[j] > 0)
                cnt = int(inter.sum())
                N[i, j] = N[j, i] = max(1, cnt)
                if cnt:
                    assert p < 31
                    bits |= inter.astype(np.int32) << p
                    pairs.append((i, j))
                    p += 1
        plan.N = tuple(tuple(int(v) for v in row) for row in N)
        plan.pairs = tuple(pairs)
        plan.pair_bits = np.stack(
            [band_slice(bits, s)[halo : halo + bh] for s in range(S)]
        )
        plan.gain_b = (BETA * N.sum(axis=1)).astype(np.float32)
        plan.gain_A_static = np.diag(BETA * N.sum(axis=1)).astype(np.float32)

    # ---- vignette (replicated)
    vigs = []
    for inp in mt.inputs:
        if inp.vignette is not None:
            vigs.append(
                np.asarray(resize_bilinear(inp.vignette, Hf, Wf)).astype(
                    np.float32
                )
            )
        else:
            vigs.append(np.ones((Hf, Wf), dtype=np.float32))
    plan.vignette = np.stack(vigs)

    return plan


# ------------------------------------------------------------------ forward


def _stitch_band(plan: ShardedPlan, frames):
    """One frame set on one shard.  frames: [ncam, Hf*3/2, Wf] u8.
    Returns the RGB band interior [3, bh, Wp] f32."""
    ncam = plan.num_inputs
    ext, Wp, halo, bh = plan.ext, plan.Wp, plan.halo, plan.bh

    packed = []
    for i in range(ncam):
        rgb = yuv420p_to_rgb_planar(frames[i])
        rgb = jnp.clip(rgb * plan.vignette[i][None], 0.0, 255.0)
        q = jnp.clip(jnp.round(rgb), 0.0, 255.0).astype(jnp.int32)
        packed.append((q[0] | (q[1] << 8) | (q[2] << 16)).reshape(-1))

    warped = []
    for i in range(ncam):
        out = jnp.zeros((3, ext * Wp), dtype=jnp.float32)
        for k in range(4):
            g = jnp.take(packed[i], plan.idx[i, k])
            chans = jnp.stack(
                [
                    (g & 0xFF).astype(jnp.float32),
                    ((g >> 8) & 0xFF).astype(jnp.float32),
                    ((g >> 16) & 0xFF).astype(jnp.float32),
                ]
            )
            out = out + chans * plan.w[i, k][None]
        warped.append(out.reshape(3, ext, Wp))

    # exposure gains: band-interior sums, psum'd across 'space'
    if plan.pair_bits is not None and plan.pairs:
        P_n = len(plan.pairs)
        sums = []
        for p, (i, j) in enumerate(plan.pairs):
            bit = ((plan.pair_bits >> p) & 1).astype(jnp.float32)
            ni = jnp.sqrt(
                jnp.sum(warped[i][:, halo : halo + bh] ** 2, axis=0)
            )
            nj = jnp.sqrt(
                jnp.sum(warped[j][:, halo : halo + bh] ** 2, axis=0)
            )
            sums.append(jnp.sum(ni * bit))
            sums.append(jnp.sum(nj * bit))
        sums = jax.lax.psum(jnp.stack(sums), "space")
        n = ncam
        I = jnp.zeros((n, n), dtype=jnp.float32)
        for p, (i, j) in enumerate(plan.pairs):
            cnt = float(plan.N[i][j])
            I = I.at[i, j].set(sums[2 * p] / cnt)
            I = I.at[j, i].set(sums[2 * p + 1] / cnt)
        Nf = jnp.asarray(np.array(plan.N, dtype=np.float32))
        off = 1.0 - jnp.eye(n, dtype=jnp.float32)
        diag_dyn = jnp.sum(2.0 * ALPHA * I * I * Nf * off, axis=1)
        A = (
            plan.gain_A_static
            + jnp.diag(diag_dyn)
            - 2.0 * ALPHA * I * I.T * Nf * off
        )
        gains = jnp.linalg.solve(A, plan.gain_b)
        warped = [wd * gains[i] for i, wd in enumerate(warped)]

    if plan.blend_kind == "feather":
        band = sum(
            wd * plan.feather_w[i][None] for i, wd in enumerate(warped)
        )
    elif plan.blend_kind == "multiband":
        B = plan.num_bands
        dst = [
            jnp.zeros((3, ext >> l, Wp >> l), dtype=jnp.float32)
            for l in range(B + 1)
        ]
        for i, wd in enumerate(warped):
            gauss = [wd]
            for _ in range(B):
                gauss.append(pyr_down(gauss[-1]))
            for l in range(B + 1):
                lap = gauss[l] - pyr_up(gauss[l + 1]) if l < B else gauss[B]
                dst[l] = dst[l] + lap * plan.weight_pyrs[l][i][None]
        for l in range(B + 1):
            dst[l] = dst[l] / plan.band_weights[l][None]
        band = dst[B]
        for l in range(B - 1, -1, -1):
            band = pyr_up(band) + dst[l]
    else:
        total = sum(
            (wd != 0).any(axis=0).astype(jnp.float32) for wd in warped
        )
        band = sum(warped) / jnp.maximum(total, 1.0)

    return jnp.clip(band[:, halo : halo + bh], 0.0, 255.0)


class ShardedMapper:
    """Stitch batches of frame sets over a ('data', 'space') mesh."""

    def __init__(
        self,
        mt: MapperTemplate,
        in_sizes,
        mesh: Mesh,
        blend: int = 128,
        enable_gain: bool = True,
    ):
        self.mesh = mesh
        S = mesh.shape["space"]
        self.plan = build_sharded_plan(
            mt, in_sizes, S, blend=blend, enable_gain=enable_gain
        )
        plan_sharding = jax.tree.map(
            lambda _: NamedSharding(mesh, P("space")), self.plan
        )
        # replicated leaves get overridden
        repl = NamedSharding(mesh, P())
        plan_sharding.vignette = repl
        plan_sharding.gain_b = repl
        plan_sharding.gain_A_static = repl
        self._plan_dev = jax.device_put(self.plan, plan_sharding)

        from jax import shard_map

        plan_specs = jax.tree.map(lambda _: P("space"), self.plan)
        plan_specs.vignette = P()
        plan_specs.gain_b = P()
        plan_specs.gain_A_static = P()

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(plan_specs, P("data")),
            out_specs=P("data", None, "space", None),
            check_vma=False,
        )
        def step(plan_local, frames_local):
            # strip the local S axis (== 1) off space-sharded leaves only
            plan_sq = jax.tree.map(
                lambda leaf, spec: leaf[0] if spec == P("space") else leaf,
                plan_local,
                plan_specs,
            )
            return jax.vmap(lambda fr: _stitch_band(plan_sq, fr))(
                frames_local
            )

        self._step = jax.jit(step)

    def stitch_batch(self, frames):
        """frames: [B, ncam, Hf*3/2, Wf] u8 (B divisible by mesh 'data').
        Returns RGB canvas [B, 3, Hp, Wp] f32 sharded over (data, space)."""
        return self._step(self._plan_dev, jnp.asarray(frames))


