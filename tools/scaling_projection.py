#!/usr/bin/env python
"""Device-grounded multi-chip scaling projection (VERDICT r3 next #1).

Real multi-chip hardware is not available in this environment, so the
scaling number for the BASELINE ">=0.8 efficiency at N>=2" target is
CONSTRUCTED from what is measurable:

(a) per-chip slice time: for S in {1, 2, 4, 8}, build the REAL S-way
    sharded plan (production yuv420 + bf16 config on the bench rig) and
    run ONE shard's band program on the one real chip — the exact
    compute a chip in an S-way space group executes per frame,
    including halo recompute and per-window work division.  The worst
    shard bounds the frame's critical path.
(b) communication bound: the sharded design exchanges NO image rows
    (halos are recomputed); per frame the cross-chip traffic is
      * the replicated camera-frame broadcast over ICI
        (bytes = sum of camera YUV420P planes), overlappable with the
        previous frame's compute (double-buffered pipeline), and
      * one psum of the pair gain sums (2P floats — negligible).
    The bound uses a conservative per-chip ICI bandwidth (see --ici).

Projected per-S throughput: 1 / max(worst_slice, bcast) frames/s;
efficiency(S) = t(1) / (S * max(worst_slice(S), bcast)).

Emulation detail: the shard-s leaves of the S-way plan are sliced out
host-side and the band function runs under a 1-device ('data','space')
mesh, so psum('space') degenerates to identity — the gain solve costs
the same FLOPs, and gain VALUES equal the single-shard partial solve
(work-equivalent; parity of the full solve is covered by
tests/test_sharded*.py on the 8-device CPU mesh).

Usage: python tools/scaling_projection.py [--iters 16] [--s 1,2,4,8]
       [--shards auto] [--ici 45e9] [--json out.json]
"""

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--s", default="1,2,4,8")
    ap.add_argument(
        "--shards",
        default="auto",
        help="comma list of shard indices to emulate per S, or 'auto' "
        "(edge + middle)",
    )
    ap.add_argument("--ici", type=float, default=45e9,
                    help="assumed per-chip ICI bandwidth, bytes/s")
    ap.add_argument("--blend", type=int, default=None)
    ap.add_argument(
        "--batch",
        type=int,
        default=1,
        help="frame sets per program on the emulated shard (the "
        "per-device 'data' batch of a (data, space) mesh): the "
        "frames_axis grid amortizes the non-dividing per-launch + "
        "dispatch fixed costs by 1/B — the round-5 high-S lever; "
        "per-frame ms = t/B, efficiency vs the S=1 B=1 baseline",
    )
    ap.add_argument("--no-gain", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--scale", type=int, default=1,
                    help="divide rig geometry by this (CPU smoke runs)")
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

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    from bench import BLEND, CAM, CANVAS_H, CANVAS_W, six_cam_rig
    from octvr_tpu.parallel.sharded import (
        _SPACE_FIELDS,
        _stitch_band_yuv,
        _stitch_band_yuv_multi,
        build_sharded_plan,
    )
    from octvr_tpu.template import compile_rig

    blend = args.blend if args.blend is not None else BLEND
    interpret = jax.devices()[0].platform != "tpu"
    if interpret:
        print("# WARNING: no TPU — interpret mode, times not meaningful",
              file=sys.stderr)

    t0 = time.time()
    rig = six_cam_rig()
    cam = CAM // args.scale
    cw, ch = CANVAS_W // args.scale, CANVAS_H // args.scale
    for spec in rig["inputs"]:
        spec["options"]["width"] = cam
        spec["options"]["height"] = cam
    mt = compile_rig(rig, cw, ch)
    mt.create_masks()
    print(f"# template compiled in {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    base = [
        rng.integers(0, 255, (cam * 3 // 2, cam), dtype=np.uint8)
        for _ in range(6)
    ]
    frame_bytes = sum(f.nbytes for f in base)
    bcast_ms = frame_bytes / args.ici * 1e3

    mesh = Mesh(
        np.array(jax.devices()[:1]).reshape(1, 1), ("data", "space")
    )

    results = []
    t1_ms = None
    for S in (int(v) for v in args.s.split(",")):
        t0 = time.time()
        plan = build_sharded_plan(
            mt,
            [(cam, cam)] * 6,
            S,
            blend=blend,
            enable_gain=not args.no_gain,
            blend_dtype="bfloat16",
            pipeline="yuv420",
        )
        print(
            f"# S={S}: plan built in {time.time()-t0:.1f}s  "
            f"bh={plan.bh} halo={plan.halo} ext={plan.ext} "
            f"(ext/bh = {plan.ext/plan.bh:.2f})",
            file=sys.stderr,
        )

        if args.shards == "auto":
            shard_ids = sorted({0, S // 2})
        else:
            shard_ids = [int(v) for v in args.shards.split(",") if int(v) < S]

        # leaf spec map (same id-set logic as ShardedMapper)
        sharded_leaves = set()
        for f in _SPACE_FIELDS:
            v = getattr(plan, f)
            if v is not None:
                for leaf in jax.tree.leaves(v):
                    sharded_leaves.add(id(leaf))

        per_shard_ms = {}
        for s in shard_ids:
            plan_s = jax.tree.map(
                lambda leaf: leaf[s] if id(leaf) in sharded_leaves else leaf,
                plan,
            )
            # opt into the single-device all-gather tiling (timing
            # emulation only; a real mesh must never take that path)
            object.__setattr__(plan_s, "emulate_space", True)
            specs = jax.tree.map(lambda _: P(), plan_s)

            B = args.batch

            @jax.jit
            @partial(
                shard_map,
                mesh=mesh,
                in_specs=(specs, tuple(P() for _ in range(6 * B))),
                out_specs=(P(), P()),
                check_vma=False,
            )
            def step(plan_local, frames):
                if B == 1:
                    return _stitch_band_yuv(
                        plan_local, list(frames), interpret, "yuv420p"
                    )
                return _stitch_band_yuv_multi(
                    plan_local,
                    [list(frames[b * 6 : (b + 1) * 6]) for b in range(B)],
                    interpret,
                    "yuv420p",
                )

            plan_dev = jax.device_put(plan_s)
            n_calls = max(1, args.iters // B)
            sets = []
            for c in range(n_calls):
                fs = []
                for b in range(B):
                    fs.extend(
                        jax.device_put(
                            np.clip(
                                f.astype(np.int16) + c * B + b, 0, 255
                            ).astype(np.uint8)
                        )
                        for f in base
                    )
                sets.append(tuple(fs))
            jax.block_until_ready(sets)

            t0 = time.time()
            out, _ = step(plan_dev, sets[0])
            _sync = float(
                jnp.sum(out[..., ::101, ::103].astype(jnp.int32))
            )
            print(
                f"# S={S} shard {s}: first call {time.time()-t0:.1f}s "
                f"(out {out.shape}, checksum {int(_sync)})",
                file=sys.stderr,
            )
            t0 = time.time()
            outs = [step(plan_dev, fs)[0] for fs in sets]
            _sync = float(
                jnp.sum(outs[-1][..., ::101, ::103].astype(jnp.int32))
            )
            dt_ms = (time.time() - t0) / (n_calls * B) * 1e3
            per_shard_ms[s] = dt_ms
            print(
                f"# S={S} shard {s}: {dt_ms:.2f} ms/frame "
                f"(B={B}, value-synced)",
                file=sys.stderr,
            )

        worst = max(per_shard_ms.values())
        if S == 1:
            t1_ms = worst
        crit = max(worst, bcast_ms)
        eff = (t1_ms / (S * crit)) if t1_ms else None
        row = {
            "S": S,
            "B": args.batch,
            "bh": plan.bh,
            "halo": plan.halo,
            "ext": plan.ext,
            "per_shard_ms": {str(k): round(v, 2) for k, v in per_shard_ms.items()},
            "worst_slice_ms": round(worst, 2),
            "bcast_bound_ms": round(bcast_ms, 3),
            "projected_fps": round(1e3 / crit, 1),
            "projected_efficiency": round(eff, 3) if eff else None,
        }
        results.append(row)
        print(json.dumps(row))

    summary = {
        "metric": "projected_space_scaling",
        "config": f"4k 6-cam yuv420 bf16 blend={blend} batch={args.batch}",
        "frame_broadcast_bytes": frame_bytes,
        "ici_bytes_per_s": args.ici,
        "rows": results,
    }
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
