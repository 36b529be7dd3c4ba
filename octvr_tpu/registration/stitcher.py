"""High-level auto-registration pipeline (the cv::Stitcher
estimateTransform role, stitcher.cpp:94-113):

    images -> gray + downscale (0.6 MP registration resolution)
    -> features -> pairwise match + RANSAC -> biggest component
    -> focal estimation -> rotation propagation -> bundle adjustment
    -> wave correction -> rig description (compile-ready)

The resulting rig JSON (pinhole cameras with rotation matrices in the
engine's sphere convention) feeds octvr_tpu.template.compile_rig
directly, closing the loop calibration -> template -> online stitch.
"""

import math
from dataclasses import dataclass, field
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..ops.resize import resize_bilinear
from .bundle import bundle_adjust_ray, bundle_adjust_reproj
from .estimators import estimate_rotations, leave_biggest_component
from .features import detect_and_describe, rgb_to_gray
from .matchers import match_images
from .wave import wave_correct

REGISTR_MEGAPIX = 0.6  # stitcher.cpp:541

__all__ = ["register_images", "RegistrationResult", "cameras_to_rig"]


@dataclass
class RegistrationResult:
    cameras: list
    indices: list  # surviving image indices (biggest component)
    matches: dict
    features: list
    rms: float = float("nan")
    work_scale: float = 1.0


def register_images(
    images,
    ba="ray",
    conf_thresh=1.0,
    match_conf=0.3,
    max_features=1000,
    wave_kind="horiz",
    seed=0,
    levels=1,
    range_width=None,
    finder="fast",
):
    """images: list of [H, W, 3] uint8/float RGB arrays (equal or varying
    sizes).  Returns RegistrationResult with refined CameraParams (focals
    scaled back to original resolution).

    ``levels`` > 1 enables the multi-scale detector (SURF-octave /
    ORB-pyramid role, matchers.cpp:365-460) — needed when the rig mixes
    very different focal lengths.  ``range_width`` restricts matching to
    ordered neighbors (BestOf2NearestRangeMatcher, matchers.cpp:667-695).
    ``finder``: "fast" (FAST-9 + rBRIEF, the ORB role) or "blob" (the
    multi-scale determinant-of-Hessian detector with a SURF-style float
    descriptor, registration/blobs.py — the SurfFeaturesFinder role,
    matchers.cpp:365-389, for low-texture rigs where corners are
    sparse)."""
    from .blobs import detect_and_describe_blobs
    from .features import detect_and_describe_pyramid

    assert finder in ("fast", "blob")
    feats = []
    work_scales = []
    for img in images:
        img = np.asarray(img, dtype=np.float32)
        h, w = img.shape[:2]
        scale = min(1.0, math.sqrt(REGISTR_MEGAPIX * 1e6 / (w * h)))
        sh, sw = int(h * scale), int(w * scale)
        work_scales.append(scale)
        small = resize_bilinear(img, sh, sw)
        gray = np.asarray(rgb_to_gray(jnp.asarray(small)))
        if finder == "blob":
            feats.append(
                detect_and_describe_blobs(
                    jnp.asarray(gray), max_features=max_features
                )
            )
        elif levels > 1:
            feats.append(
                detect_and_describe_pyramid(
                    gray, max_features=max_features, levels=levels
                )
            )
        else:
            feats.append(
                detect_and_describe(
                    jnp.asarray(gray), max_features=max_features
                )
            )

    matches = match_images(
        feats, match_conf=match_conf, seed=seed, range_width=range_width
    )

    keep = leave_biggest_component(len(feats), matches, conf_thresh)
    if len(keep) < len(feats):
        remap = {old: new for new, old in enumerate(keep)}
        feats = [feats[i] for i in keep]
        matches = {
            (remap[i], remap[j]): mi
            for (i, j), mi in matches.items()
            if i in remap and j in remap
        }

    cams, centers = estimate_rotations(feats, matches)

    if ba == "ray":
        cams, rms = bundle_adjust_ray(feats, matches, cams, conf_thresh)
    elif ba == "reproj":
        cams, rms = bundle_adjust_reproj(feats, matches, cams, conf_thresh)
    elif ba is None:
        rms = float("nan")
    else:
        raise ValueError(f"unknown ba {ba!r}")

    if wave_kind:
        rs = wave_correct([c.R for c in cams], kind=wave_kind)
        for c, r in zip(cams, rs):
            c.R = r

    # scale focals back to the original resolution
    for c, s in zip(cams, [work_scales[i] for i in keep]):
        c.focal /= s
        c.ppx /= s
        c.ppy /= s

    return RegistrationResult(
        cameras=cams,
        indices=keep,
        matches=matches,
        features=feats,
        rms=rms,
        work_scale=float(np.mean(work_scales)),
    )


# Conversion between the stitching/OpenCV camera convention
# (x right, y down, z forward; world ray = R K^-1 p) and the engine's
# sphere convention (camera.hpp:33-43: x forward at lon 0, y up, left-
# handed; the engine's unrotated pinhole looks along sphere (0,0,1) ==
# lon -pi/2 with a vertical image flip).
#
# Numerically validated (test_cameras_to_rig_roundtrip): with the world
# frames identified via d_sphere = C d_cv (C = diag(1,-1,1), engine y up
# vs cv y down), the engine pinhole with
#     R_oct = C @ R_cv^T @ C,   cx_eng = cx_cv,  cy_eng = cy_cv
# reproduces the cv projection exactly; the engine's normalized y equals
# v_cv / h directly (its internal flip, pinhole_cam.cpp:48, cancels
# against the axis change).
_C = np.diag([1.0, -1.0, 1.0])


def cameras_to_rig(result: RegistrationResult, sizes, out_type="equirectangular"):
    """Build a rig description usable by compile_rig from refined cameras.

    sizes: [(w, h)] per surviving camera (original resolution).
    """
    inputs = []
    for cam, (w, h) in zip(result.cameras, sizes):
        # engine rotation: R_oct = C R_cv^T C (world frames identified via
        # C, engine projects the *rotated* world point, cv rotates
        # camera->world), validated by test_registration roundtrips
        R_oct = _C @ np.asarray(cam.R, dtype=np.float64).T @ _C
        inputs.append(
            {
                "type": "pinhole",
                "options": {
                    "fx": float(cam.focal),
                    "fy": float(cam.focal * cam.aspect),
                    "cx": float(cam.ppx + 0.5 * w),
                    "cy": float(cam.ppy + 0.5 * h),
                    "dist_coeffs": [0.0, 0.0, 0.0, 0.0],
                    "width": int(w),
                    "height": int(h),
                    "rotation_matrix": [float(v) for v in R_oct.reshape(-1)],
                },
            }
        )
    return {"output": {"type": out_type, "options": {}}, "inputs": inputs}
