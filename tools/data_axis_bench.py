#!/usr/bin/env python
"""Data-axis scaling: convert the "~1.0 efficiency by construction"
claim (docs/scaling.md) into measurements (VERDICT r4 next #6).

The 'data' mesh axis assigns each chip its own frame sets — per-chip
work is the S=1 program and no image bytes cross chips.  Three
measurable facts replace the construction argument:

1. **No data-axis collectives** (CPU mesh, compiled HLO): the sharded
   step on a (data=D, space=1) mesh compiles to a program whose only
   collectives are the documented 'space' ones — with space=1 there are
   NONE touching image-sized operands.  Verified by scanning the
   compiled HLO text for collective ops.
2. **Per-chip rate is independent of D** up to the host feed: the real
   chip runs the SAME program at any D, so throughput(D) = D x
   fps_chip as long as frames arrive.  fps_chip is measured here at
   B = 1/2/4 frame sets per program (the frames_axis batched grid —
   launch/dispatch amortization, VERDICT r4 next #2).
3. **Host-feed bound**: at 4K 6-cam each frame set is ~33 MB of
   YUV420P.  Feeding D chips at rate f needs D*f*33 MB/s of H2D; the
   bound on D is printed for the measured per-chip rate at PCIe-class
   (10 GB/s) and the measured device_put rate of THIS host.

Usage: python tools/data_axis_bench.py [--iters 16] [--json out.json]
       [--cpu-hlo-only]
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def hlo_collective_scan():
    """Compile the sharded step on a (data=4, space=1) CPU mesh and
    scan the optimized HLO for collectives (fact 1)."""
    import subprocess

    code = r"""
import os
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, sys, re
sys.path.insert(0, "tests")
sys.path.insert(0, ".")
from octvr_tpu.parallel.sharded import ShardedMapper, make_mesh
from octvr_tpu.template import compile_rig
from rigs import two_fisheye_rig
rig = two_fisheye_rig()
for spec in rig["inputs"]:
    spec["options"].update(width=128, height=128)
mt = compile_rig(rig, 128, 64); mt.create_masks()
sm = ShardedMapper(mt, [(128, 128)] * 2, make_mesh(4, 1), blend=16,
                   enable_gain=True, pipeline="yuv420")
frames = [np.zeros((4, 192, 128), np.uint8)] * 2
lowered = sm._step.lower(sm._plan_dev, tuple(np.asarray(f) for f in frames))
hlo = lowered.compile().as_text()
pat = re.compile(r"all-reduce|all-gather|collective-permute|"
                 r"all-to-all|reduce-scatter")
rows = []
for line in hlo.splitlines():
    if not pat.search(line):
        continue
    m = re.search(r"replica_groups=\{(.*?)\}\}", line)
    groups = (m.group(1) + "}") if m else "?"
    shape = re.search(r"= (\S+) (all-\w+|collective-\w+|reduce-scatter)", line)
    # singleton groups ({{0},{1},...}) = identity collective: zero
    # cross-chip bytes at runtime
    singleton = all(
        len(g.split(",")) == 1
        for g in re.findall(r"\{([^{}]*)\}", groups + "}")
    ) if m else False
    rows.append(
        (shape.group(1) if shape else "?",
         "identity(singleton-groups)" if singleton else groups)
    )
if rows:
    print("COLLECTIVES:" + ";".join(f"{s} {g}" for s, g in rows))
else:
    print("COLLECTIVES:none")
"""
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."),
    )
    for line in r.stdout.splitlines():
        if line.startswith("COLLECTIVES:"):
            return line.split(":", 1)[1]
    raise RuntimeError(
        f"HLO scan failed: rc={r.returncode}\n{r.stderr[-2000:]}"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--json", default=None)
    ap.add_argument("--cpu-hlo-only", action="store_true")
    ap.add_argument("--batches", default="1,2,4")
    args = ap.parse_args()

    colls = hlo_collective_scan()
    print(
        f"# (data=4, space=1) compiled HLO collectives: {colls}",
        file=sys.stderr,
    )

    result = {
        "metric": "data_axis_scaling",
        "data_axis_collectives_space1": colls,
    }
    if args.cpu_hlo_only:
        print(json.dumps(result))
        return

    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

    from bench import BLEND, CAM, CANVAS_H, CANVAS_W, six_cam_rig
    from octvr_tpu.stitch import Mapper
    from octvr_tpu.template import compile_rig

    interpret = jax.devices()[0].platform != "tpu"
    if interpret:
        print("# WARNING: no TPU — times not meaningful", file=sys.stderr)

    rig = six_cam_rig()
    mt = compile_rig(rig, CANVAS_W, CANVAS_H)
    mt.create_masks()
    mapper = Mapper(mt, [(CAM, CAM)] * 6, blend=BLEND, enable_gain=True)
    rng = np.random.default_rng(0)
    base = [
        rng.integers(0, 255, (CAM * 3 // 2, CAM), dtype=np.uint8)
        for _ in range(6)
    ]
    frame_bytes = sum(f.nbytes for f in base)

    # measured device_put rate of THIS host (tunnel or PCIe)
    bufs = [
        np.clip(base[0].astype(np.int16) + i, 0, 255).astype(np.uint8)
        for i in range(4)
    ]
    t0 = time.time()
    devs = [jax.device_put(b) for b in bufs]
    jax.block_until_ready(devs)
    h2d_bps = sum(b.nbytes for b in bufs) / max(1e-9, time.time() - t0)

    rows = []
    fps1 = None
    for B in (int(v) for v in args.batches.split(",")):
        n_calls = max(1, args.iters // B)
        sets = []
        for c in range(n_calls):
            sets.append(
                tuple(
                    jax.device_put(
                        np.stack(
                            [
                                np.clip(
                                    base[i].astype(np.int16) + c * B + b,
                                    0,
                                    255,
                                ).astype(np.uint8)
                                for b in range(B)
                            ]
                        )
                    )
                    for i in range(6)
                )
            )
        jax.block_until_ready(sets)
        t0 = time.time()
        ob, _ = mapper.stitch_batch(sets[0])
        _s = float(jnp.sum(ob[:, ::101, ::103].astype(jnp.int32)))
        print(
            f"# B={B}: first call {time.time()-t0:.1f}s "
            f"(checksum {int(_s)})",
            file=sys.stderr,
        )
        t0 = time.time()
        obs = [mapper.stitch_batch(s)[0] for s in sets]
        _s = float(jnp.sum(obs[-1][:, ::101, ::103].astype(jnp.int32)))
        dt = (time.time() - t0) / (n_calls * B)
        fps = 1.0 / dt
        if B == 1:
            fps1 = fps
        rows.append(
            {
                "frames_per_program": B,
                "ms_per_frame": round(dt * 1e3, 2),
                "fps_per_chip": round(fps, 1),
                "amortization_vs_b1": round(fps / fps1, 3) if fps1 else None,
            }
        )
        print(
            f"# B={B}: {dt*1e3:.2f} ms/frame = {fps:.1f} fps/chip",
            file=sys.stderr,
        )

    best = max(r["fps_per_chip"] for r in rows)
    result.update(
        {
            "frame_set_bytes": frame_bytes,
            "h2d_bytes_per_s_this_host": round(h2d_bps),
            "rows": rows,
            "feed_bound_chips_at_pcie10GBps": round(
                10e9 / (best * frame_bytes), 1
            ),
            "feed_bound_chips_this_host": round(
                h2d_bps / (best * frame_bytes), 2
            ),
            "note": "data-axis throughput(D) = D * fps_per_chip up to "
            "the host feed bound; no cross-chip image bytes (HLO scan)",
        }
    )
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
