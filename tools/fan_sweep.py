#!/usr/bin/env python
"""Sweep the remap-kernel knobs (grid group size G, fan CHUNK) on the
real-chip 4K 6-cam bench config and print steady-state ms/frame per
config.

The remaining per-frame cost after pair-packing is per-grid-step fixed
overhead x steps plus the untile/take framework (docs/kernel-notes.md,
round-3 row-packing analysis); G trades steps against per-step fan
setups, CHUNK trades fori iterations against unrolled body size.  This
harness measures those trade-offs end to end — phase isolation is
unreliable below ~5 ms (notes, round 2).

Usage: python tools/fan_sweep.py "G,CHUNK" "G,CHUNK" ...
  G=0 or CHUNK=0 keeps the auto pick.  The template is compiled once
  and cached in .bench_cache.npz next to the repo.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench as bench_mod


def get_template():
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

    from octvr_tpu.template import compile_rig
    from octvr_tpu.template.io import load_npz, save_npz

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache.npz",
    )
    if os.path.exists(path):
        t0 = time.time()
        mt = load_npz(path)
        print(f"# template loaded from cache in {time.time()-t0:.1f}s",
              file=sys.stderr)
        return mt
    t0 = time.time()
    mt = compile_rig(bench_mod.six_cam_rig(), bench_mod.CANVAS_W,
                     bench_mod.CANVAS_H)
    mt.create_masks()
    print(f"# template compiled in {time.time()-t0:.1f}s", file=sys.stderr)
    save_npz(mt, path)
    return mt


def run_config(mt, frame_sets, g, chunk, accs=0):
    import jax
    import jax.numpy as jnp

    from octvr_tpu.stitch import Mapper

    if g:
        os.environ["OCTVR_REMAP_GROUP"] = str(g)
    else:
        os.environ.pop("OCTVR_REMAP_GROUP", None)
    if chunk:
        os.environ["OCTVR_FAN_CHUNK"] = str(chunk)
    else:
        os.environ.pop("OCTVR_FAN_CHUNK", None)
    if accs:
        os.environ["OCTVR_FAN_ACCS"] = str(accs)
    else:
        os.environ.pop("OCTVR_FAN_ACCS", None)

    t0 = time.time()
    mapper = Mapper(
        mt,
        [(bench_mod.CAM, bench_mod.CAM)] * 6,
        blend=bench_mod.BLEND,
        enable_gain=True,
    )
    t_plan = time.time() - t0

    t0 = time.time()
    out, gains = mapper.stitch(list(frame_sets[0]))
    _ = float(jnp.sum(out[:64, :64].astype(jnp.float32)))
    t_compile = time.time() - t0

    n = len(frame_sets)
    t0 = time.time()
    for fs in frame_sets:
        out, gains = mapper.stitch(list(fs))
    _ = float(jnp.sum(out[:64, :64].astype(jnp.float32)))
    dt = (time.time() - t0) / n
    cksum = int(np.asarray(out[::191, ::191]).astype(np.int64).sum())
    print(
        f"G={g or 'auto'} CHUNK={chunk or 'auto'} "
        f"ACCS={accs or 'auto'}: {dt*1000:.2f} ms/frame "
        f"({1.0/dt:.1f} fps)  checksum={cksum}  "
        f"[plan {t_plan:.0f}s compile {t_compile:.0f}s]",
        flush=True,
    )
    return dt


def main():
    import jax

    configs = []
    for a in sys.argv[1:]:
        parts = [int(v) for v in a.split(",")]
        while len(parts) < 3:
            parts.append(0)
        configs.append(tuple(parts))
    if not configs:
        configs = [(0, 0, 0), (8, 0, 0), (12, 0, 0)]

    mt = get_template()

    rng = np.random.default_rng(0)
    cam = bench_mod.CAM
    base = [
        rng.integers(0, 255, (cam * 3 // 2, cam), dtype=np.uint8)
        for _ in range(6)
    ]
    iters = 12
    frame_sets = []
    for i in range(iters):
        frame_sets.append(
            tuple(
                jax.device_put(
                    np.clip(f.astype(np.int16) + i, 0, 255).astype(np.uint8)
                )
                for f in base
            )
        )
    jax.block_until_ready([f for fs in frame_sets for f in fs])

    for g, c, a in configs:
        run_config(mt, frame_sets, g, c, a)


if __name__ == "__main__":
    main()
