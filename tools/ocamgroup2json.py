#!/usr/bin/env python3
"""Generate per-camera defish rig JSONs from ocam calib files
(role of modules/octvr/tools/ocamgroup2json.py)."""

import json
import os
import sys


def main():
    output = {
        "type": "perspective",
        "options": {"aspect_ratio": 1.6, "sf": 2.0},
    }
    for i, path in enumerate(sys.argv[1:], 1):
        rig = {
            "output": output,
            "inputs": [
                {
                    "type": "ocam_fisheye",
                    "options": {"file": os.path.abspath(path)},
                }
            ],
        }
        with open(f"defish_{i}.json", "w") as f:
            json.dump(rig, f, indent=4)


if __name__ == "__main__":
    main()
