"""cv::Stitcher-style one-call facade: images in, panorama out.

Pipeline (stitcher.cpp:366 role): register (features -> match -> focal ->
rotations -> BA -> wave correction) at 0.6 MP, then compose through the
engine's own offline/online split — export the refined cameras as a rig,
compile a template (remap tables + seam masks) and run the jitted
per-frame stitch.  This replaces the reference's warper-based
composePanorama with the engine-native template compose (same result
surface: warped images, exposure compensation, seam masks, multiband
blending)."""

from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = ["Stitcher", "StitchResult"]


@dataclass
class StitchResult:
    panorama: np.ndarray  # [H, W, 3] uint8
    indices: list  # images used
    rms: float
    rig: dict


class Stitcher:
    def __init__(
        self,
        ba="ray",
        conf_thresh=1.0,
        blend=64,
        enable_gain=True,
        wave_kind="horiz",
        seam="distance",
        max_features=1500,
        finder="fast",
        levels=1,
        range_width=None,
    ):
        """``finder``/``levels``/``range_width`` mirror the reference
        Stitcher's setFeaturesFinder / setFeaturesMatcher choices
        (stitching.hpp:96, matchers.cpp:365-460): "fast" = FAST-9 +
        rBRIEF (ORB role), "blob" = Hessian blob pyramid (SURF role,
        low-texture rigs); levels > 1 = multi-scale pyramid detector;
        range_width = ordered-sequence range matcher."""
        self.ba = ba
        self.conf_thresh = conf_thresh
        self.blend = blend
        self.enable_gain = enable_gain
        self.wave_kind = wave_kind
        self.seam = seam
        self.max_features = max_features
        self.finder = finder
        self.levels = levels
        self.range_width = range_width

    def stitch(self, images, out_width=2048, out_height=0, use_device=True):
        """images: list of [H, W, 3] uint8/float arrays.  Returns
        StitchResult."""
        import jax.numpy as jnp

        from .ops.color import rgb_to_yuv420p, yuv420p_to_rgb
        from .registration import cameras_to_rig, register_images
        from .template import compile_rig

        res = register_images(
            images,
            ba=self.ba,
            conf_thresh=self.conf_thresh,
            max_features=self.max_features,
            wave_kind=self.wave_kind,
            finder=self.finder,
            levels=self.levels,
            range_width=self.range_width,
        )
        if len(res.indices) < 2:
            raise RuntimeError("need at least 2 registrable images")
        used = [np.asarray(images[i])[..., :3] for i in res.indices]
        sizes = [(im.shape[1], im.shape[0]) for im in used]
        rig = cameras_to_rig(res, sizes)
        mt = compile_rig(rig, out_width, out_height or out_width // 2)
        seam_imgs = used if self.seam == "graphcut" else None
        mt.create_masks(seam_imgs)

        if use_device:
            from .stitch import Mapper

            mapper = Mapper(
                mt,
                [(im.shape[0], im.shape[1]) for im in used],
                blend=self.blend,
                enable_gain=self.enable_gain,
            )
            frames = [
                np.asarray(
                    rgb_to_yuv420p(jnp.asarray(im.astype(np.float32)))
                )
                for im in used
            ]
            out, _ = mapper.stitch(frames)
            pano = np.asarray(yuv420p_to_rgb(jnp.asarray(np.asarray(out))))
            pano = np.clip(pano, 0, 255).astype(np.uint8)
        else:
            from .template.compiler import _remap_image_cpu

            W, H = mt.out_size
            pano = np.zeros((H, W, 3), np.uint8)
            for inp, sm, im in zip(mt.inputs, mt.seam_masks, used):
                x, y, rw, rh = inp.roi
                warped = _remap_image_cpu(
                    im.astype(np.uint8), inp.map1, inp.map2
                )
                sel = sm > 128
                pano[y : y + rh, x : x + rw][sel] = warped[sel]

        return StitchResult(
            panorama=pano, indices=res.indices, rms=res.rms, rig=rig
        )
