#!/usr/bin/env python3
"""Swap a rig's output with input #N — maps panorama back into a camera
view (role of modules/octvr/tools/json_reverse.py).

Usage: json_reverse.py RIG.json N
"""

import json
import sys


def main():
    data = json.load(open(sys.argv[1]))
    n = int(sys.argv[2])
    print(
        json.dumps(
            {
                "inputs": [data["output"]],
                "output": data["inputs"][n],
            },
            indent=4,
        )
    )


if __name__ == "__main__":
    main()
