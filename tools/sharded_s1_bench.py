#!/usr/bin/env python
"""Real-chip S=1 sharded-path benchmark on the exact bench.py rig.

VERDICT r2 item 2 acceptance: the sharded band path with per-input
aligned window ROIs must land within ~15% of the single-chip Mapper's
18.6 ms/frame (54.4 fps) on the same 6-cam 4K workload — otherwise a
2-chip space-sharded run would only tie one chip running the plain
Mapper.  Production config: pipeline=yuv420, blend_dtype=bfloat16.

Usage: python tools/sharded_s1_bench.py [--iters 24] [--pipeline yuv420]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--pipeline", default="yuv420")
    ap.add_argument("--blend-dtype", default="bfloat16")
    ap.add_argument("--space", type=int, default=1)
    args = ap.parse_args()

    import jax

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
    from octvr_tpu.parallel.sharded import ShardedMapper, make_mesh
    from octvr_tpu.template import compile_rig

    t0 = time.time()
    rig = six_cam_rig()
    mt = compile_rig(rig, CANVAS_W, CANVAS_H)
    mt.create_masks()
    print(f"# template compiled in {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    mesh = make_mesh(1, args.space)
    sm = ShardedMapper(
        mt,
        [(CAM, CAM)] * 6,
        mesh,
        blend=BLEND,
        enable_gain=True,
        blend_dtype=args.blend_dtype,
        pipeline=args.pipeline,
    )
    print(f"# sharded plan built in {time.time()-t0:.1f}s", file=sys.stderr)
    print(
        f"# rois={sm.plan.rois} oy_static={sm.plan.roi_oy_static}",
        file=sys.stderr,
    )

    rng = np.random.default_rng(0)
    base = np.stack(
        [
            rng.integers(0, 255, (CAM * 3 // 2, CAM), dtype=np.uint8)
            for _ in range(6)
        ]
    )
    sets = []
    for i in range(args.iters):
        sets.append(
            jax.device_put(
                np.clip(base.astype(np.int16) + i, 0, 255).astype(
                    np.uint8
                )[None]
            )
        )
    jax.block_until_ready(sets)

    import jax.numpy as jnp

    t0 = time.time()
    out, gains = sm.stitch_batch(sets[0])
    _sync = float(jnp.sum(out[0][::101, ::103].astype(jnp.int32)))
    print(f"# first call (compile+run) {time.time()-t0:.1f}s", file=sys.stderr)
    print(f"# output checksum (frame 0): {int(_sync)}", file=sys.stderr)
    sys.stderr.flush()

    t0 = time.time()
    outs = [sm.stitch_batch(fs)[0] for fs in sets]
    _sync = float(jnp.sum(outs[-1][0][::101, ::103].astype(jnp.int32)))
    dt = (time.time() - t0) / args.iters
    print(f"# steady-state {dt*1e3:.2f} ms/frame (value-synced)", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"sharded_s{args.space}_4k_ms_per_frame",
                "value": round(dt * 1e3, 2),
                "unit": "ms",
                "pipeline": args.pipeline,
                "blend_dtype": args.blend_dtype,
                "fps": round(1.0 / dt, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
