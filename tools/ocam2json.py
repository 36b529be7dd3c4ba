#!/usr/bin/env python3
"""Scaramuzza ocam calibration .txt -> single-camera rig JSON
(role of modules/octvr/tools/ocam2json.py)."""

import json
import sys


def parse_ocam_txt(path):
    lines = [
        l.strip()
        for l in open(path)
        if l.strip() and not l.strip().startswith("#")
    ]
    nums = [[float(v) for v in l.split()] for l in lines]
    opts = {
        "pol": nums[0][1:],
        "invpol": nums[1][1:],
        "xc": nums[2][0],
        "yc": nums[2][1],
        "c": nums[3][0],
        "d": nums[3][1],
        "e": nums[3][2],
        "height": int(nums[4][0]),
        "width": int(nums[4][1]),
    }
    return opts


def main():
    opts = parse_ocam_txt(sys.argv[1])
    print(
        json.dumps(
            {
                "output": {
                    "type": "equirectangular",
                    "options": {
                        "rotation": {"roll": 0, "yaw": 0, "pitch": 0}
                    },
                },
                "inputs": [{"type": "ocam_fisheye", "options": opts}],
            },
            indent=4,
        )
    )


if __name__ == "__main__":
    main()
