from .autocalib import estimate_focal, focals_from_homography
from .bundle import bundle_adjust_ray, bundle_adjust_reproj
from .estimators import (
    CameraParams,
    estimate_rotations,
    leave_biggest_component,
    max_spanning_tree,
)
from .blobs import detect_and_describe_blobs
from .features import ImageFeatures, detect_and_describe, rgb_to_gray
from .matchers import MatchesInfo, find_homography_ransac, match_images, match_pair
from .stitcher import RegistrationResult, cameras_to_rig, register_images
from .wave import wave_correct

__all__ = [
    "estimate_focal",
    "focals_from_homography",
    "bundle_adjust_ray",
    "bundle_adjust_reproj",
    "CameraParams",
    "estimate_rotations",
    "leave_biggest_component",
    "max_spanning_tree",
    "ImageFeatures",
    "detect_and_describe",
    "detect_and_describe_blobs",
    "rgb_to_gray",
    "MatchesInfo",
    "find_homography_ransac",
    "match_images",
    "match_pair",
    "RegistrationResult",
    "cameras_to_rig",
    "register_images",
    "wave_correct",
]
