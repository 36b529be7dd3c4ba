"""Synthetic test rigs with known analytic structure."""

import math

PI = math.pi


def two_fisheye_rig():
    """Two opposing full-frame fisheyes with hfov > pi: covers the full
    sphere with overlap bands at lon ~ +-pi/2 (BASELINE config 1)."""
    lens = {
        "width": 1200,
        "height": 1200,
        "hfov": PI * 1.15,
        "center_dx": 0.0,
        "center_dy": 0.0,
        "radial": [0.0, 0.0, 0.0],
    }
    return {
        "output": {"type": "equirectangular", "options": {}},
        "inputs": [
            {"type": "fullframe_fisheye", "options": dict(lens)},
            {
                "type": "fullframe_fisheye",
                "options": {
                    **lens,
                    "rotation": {"roll": 0.0, "yaw": PI, "pitch": 0.0},
                },
            },
        ],
    }


def six_cam_rig():
    """Six pinhole-like cameras on a cube-face layout with ~100 degree fov:
    full sphere coverage with generous overlaps (BASELINE config 2)."""
    inputs = []
    fov = 1.75  # rad, > pi/2 for overlap
    for yaw in (0, PI / 2, PI, -PI / 2):
        inputs.append(
            {
                "type": "fullframe_fisheye",
                "options": {
                    "width": 800,
                    "height": 800,
                    "hfov": fov,
                    "center_dx": 0.0,
                    "center_dy": 0.0,
                    "radial": [0.0, 0.0, 0.0],
                    "rotation": {"roll": 0.0, "yaw": yaw, "pitch": 0.0},
                },
            }
        )
    for pitch in (PI / 2, -PI / 2):
        inputs.append(
            {
                "type": "fullframe_fisheye",
                "options": {
                    "width": 800,
                    "height": 800,
                    "hfov": 2.2,
                    "center_dx": 0.0,
                    "center_dy": 0.0,
                    "radial": [0.0, 0.0, 0.0],
                    "rotation": {"roll": 0.0, "yaw": 0.0, "pitch": pitch},
                },
            }
        )
    return {
        "output": {"type": "equirectangular", "options": {}},
        "inputs": inputs,
    }
