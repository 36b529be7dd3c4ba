#!/usr/bin/env python3
"""PTGui (.pts) / Hugin (.pto) project -> rig JSON for the template
compiler (role of modules/octvr/tools/ptx2json.py; fresh implementation
of the public panotools script-line format).

Script-line format essentials:
  'o'/'i' lines: one image each; fields are letter-prefixed values —
     w/h size, f projection (0 rectilinear, 2 circular fisheye,
     3 fullframe fisheye, 4 equirectangular), v hfov(deg), r/p/y
     roll/pitch/yaw (deg), a/b/c radial polynomial, d/e center shift,
     Va..Vd vignetting, Eev exposure, C crop rect, S selection rect,
     field=N back-references image N's value ('j' marks stack refs)
  'k' lines: masks  (i image, t type 0 excl/1 incl/2,3 stack variants,
     p"x y x y ...")
  'c' lines: control points (n/N image ids, x/y/X/Y coords)
  '#-imgfile W H', '#-sourcemask <b64 png>', '#-dummyimage' metadata

Usage: ptx2json.py PROJECT [--lon_select S,E,OFF[,N]] [--min_lat D]
        [--max_lat D]  > rig.json
"""

import argparse
import base64
import json
import math
import re
import sys

DEG = math.pi / 180.0


def parse_project(path):
    images = []  # list of dicts of raw fields
    pending_meta = {}
    stacks = []  # list of lists of image indices
    stack_masks = []  # (stack_idx, kind, args)
    control_points = []
    masks = []  # (img, kind, points)
    is_hugin = True

    with open(path, encoding="utf-8", errors="replace") as f:
        for raw in f:
            line = raw.rstrip("\n")
            if line.startswith("#-"):
                cmd, _, args = line[2:].partition(" ")
                if cmd == "imgfile":
                    parts = args.split()
                    pending_meta["w"] = int(parts[0])
                    pending_meta["h"] = int(parts[1])
                elif cmd == "sourcemask":
                    png = base64.b64decode(args.strip())
                    pending_meta.setdefault("png_masks", []).append(png)
                elif cmd == "dummyimage":
                    pending_meta["dummy"] = True
                continue
            if line.startswith("#"):
                if "ptGui project" in line:
                    is_hugin = False
                continue
            if line[:1] in ("o", "i"):
                img = dict(pending_meta)
                pending_meta = {}
                stack_ref = None
                for tok in line[1:].split():
                    m = re.match(r"([a-zA-Z]+)(.+)", tok)
                    if not m:
                        continue
                    key, val = m.groups()
                    if val.startswith("="):
                        ref = int(val[1:])
                        if key == "j":
                            stack_ref = ref
                        val = images[ref].get(key, "0")
                    img[key] = val
                idx = len(images)
                images.append(img)
                if stack_ref is not None:
                    for s in stacks:
                        if stack_ref in s:
                            s.append(idx)
                            break
                    else:
                        stacks.append([stack_ref, idx])
                else:
                    stacks.append([idx])
                continue
            if line.startswith("k"):
                m = re.match(r'k i(\d+) t(\d+) p"(.*)"', line)
                if m:
                    masks.append(
                        (
                            int(m.group(1)),
                            int(m.group(2)),
                            [float(v) for v in m.group(3).split()],
                        )
                    )
                continue
            if line.startswith("c") and is_hugin:
                m = re.match(
                    r"c n(\d+) N(\d+) x([\d.]+) y([\d.]+) X([\d.]+) Y([\d.]+) t0",
                    line,
                )
                if m:
                    control_points.append(
                        (
                            int(m.group(1)),
                            int(m.group(2)),
                            float(m.group(3)),
                            float(m.group(4)),
                            float(m.group(5)),
                            float(m.group(6)),
                        )
                    )
                continue
    return images, stacks, masks, control_points


def image_to_input(img):
    if img.get("dummy"):
        return None
    proj = img.get("f", "0")
    w, h = int(img["w"]), int(img["h"])
    opts = {
        "width": w,
        "height": h,
        "rotation": {
            "roll": float(img.get("r", 0)) * DEG,
            "yaw": float(img.get("y", 0)) * DEG,
            "pitch": float(img.get("p", 0)) * DEG,
        },
    }
    if proj in ("2", "3"):
        typ = "fullframe_fisheye"
        opts.update(
            {
                "hfov": float(img["v"]) * DEG,
                "center_dx": float(img.get("d", 0)),
                "center_dy": float(img.get("e", 0)),
                "radial": [
                    float(img.get("a", 0)),
                    float(img.get("b", 0)),
                    float(img.get("c", 0)),
                ],
                "vignette": [
                    float(img.get("Va", 1)),
                    float(img.get("Vb", 0)),
                    float(img.get("Vc", 0)),
                    float(img.get("Vd", 0)),
                ],
                "exposure": float(img.get("Eev", 0)),
            }
        )
    elif proj == "4":
        if float(img["v"]) != 360 or w != 2 * h:
            raise ValueError("equirectangular input must be 360deg 2:1")
        typ = "equirectangular"
    else:
        raise ValueError(f"unsupported input projection f{proj}")

    if "C" in img:
        rect = [int(float(v)) for v in img["C"].split(",")]
        opts["crop"] = {"rect": rect, "is_circular": proj == "2"}
    if "S" in img:
        opts["selection"] = [int(float(v)) for v in img["S"].split(",")]
    for png in img.get("png_masks", []):
        opts.setdefault("exclude_masks", []).append(
            {"type": "png", "args": list(png)}
        )
    return {"type": typ, "options": opts}


def build_rig(path, lon_select=None, min_lat=None, max_lat=None):
    images, stacks, masks, cps = parse_project(path)
    inputs = []
    index_map = {}
    for i, img in enumerate(images):
        spec = image_to_input(img)
        if spec is not None:
            index_map[i] = len(inputs)
            inputs.append(spec)

    for img_idx, kind, pts in masks:
        targets = [img_idx]
        if kind in (2, 3):  # stack-wide masks
            for s in stacks:
                if img_idx in s:
                    targets = s
                    break
        key = "exclude_masks" if kind in (0, 2) else "include_masks"
        for t in targets:
            if t in index_map:
                inputs[index_map[t]]["options"].setdefault(key, []).append(
                    {"type": "polygonal", "args": pts}
                )

    control_points = []
    for n0, n1, x, y, X, Y in cps:
        if n0 in index_map and n1 in index_map:
            w0 = inputs[index_map[n0]]["options"]["width"]
            h0 = inputs[index_map[n0]]["options"]["height"]
            w1 = inputs[index_map[n1]]["options"]["width"]
            h1 = inputs[index_map[n1]]["options"]["height"]
            a, b = index_map[n0], index_map[n1]
            if a > b:
                a, b = b, a
                x, y, X, Y = X, Y, x, y
                w0, h0, w1, h1 = w1, h1, w0, h0
            control_points.append([a, b, x / w0, y / h0, X / w1, Y / h1])

    if lon_select:
        parts = [float(v) for v in lon_select.split(",")]
        start, end, off = parts[:3]
        num = int(parts[3]) if len(parts) > 3 else -1
        for i, spec in enumerate(inputs):
            if num < 0 or i < num:
                spec["options"]["longitude_selection"] = [
                    (start + i * off) * DEG,
                    (end + i * off) * DEG,
                ]

    out_opts = {"rotation": {"roll": 0, "yaw": 0, "pitch": 0}}
    if min_lat is not None:
        out_opts["min_lat"] = min_lat * DEG
    if max_lat is not None:
        out_opts["max_lat"] = max_lat * DEG
    return {
        "output": {"type": "equirectangular", "options": out_opts},
        "inputs": inputs,
        "control_points": control_points,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("--lon_select")
    ap.add_argument("--min_lat", type=float)
    ap.add_argument("--max_lat", type=float)
    args = ap.parse_args(argv)
    rig = build_rig(args.input, args.lon_select, args.min_lat, args.max_lat)
    json.dump(rig, sys.stdout, indent=4)
    print()


if __name__ == "__main__":
    main()
