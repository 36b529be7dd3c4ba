#!/usr/bin/env python
"""MXU-taps falsification probe (VERDICT r3 next #5).

The round-3 floor analysis concluded the remap fan is VPU-issue-bound
(~9.0 ns per visited (8,128) row, ~12 vector ops + 1 gather per visit)
and that going faster needs a different algorithm.  The untried
candidate is the move that won the pyramid stage: push the per-pixel
bilinear taps through the MXU.

Formulation B (tested here) swaps the loop structure:
  * build the VERTICAL one-hot weight matrix in-kernel per output
    row-block: W[k, pc] = wy0*(oy0==k) + wy1*(oy1==k)  — ~5 elementwise
    ops per (k, pixel), vs ~12 ops + gather in the fan;
  * one dot_general per row-block contracts the visited window rows:
    V[pc, c] = sum_k W[k, pc] * R[k, c]   (MXU, f32);
  * horizontal taps become ONE take_along_axis per row-block on V
    (plus the paired transpose back to lane layout), vs one gather per
    visited row in the fan.

Formulation A is the production fan body (nc=1, unpaired) on the same
synthetic workload, matched to the production Y-fan stats from
tools/floor_probe.py: 1,917 grid steps x G=8 tiles, KH=80 window rows,
~48 visited rows per tile.

Both kernels must agree bit-for-bit; the probe prints ms per frame-
equivalent for each.  A wins -> integrate; B loses -> append the
negative to docs/kernel-notes.md and the floor stands defended.

Usage: python tools/mxu_taps_probe.py [--steps 1917] [--g 8]
       [--kh 80] [--lo 16] [--hi 64] [--iters 20] [--interpret]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TH, TW = 8, 128
CHUNK = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1917)
    ap.add_argument("--g", type=int, default=8)
    ap.add_argument("--kh", type=int, default=80)
    ap.add_argument("--lo", type=int, default=16)
    ap.add_argument("--hi", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

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

    N, G, KH = args.steps, args.g, args.kh
    LO, HI = args.lo, args.hi
    interpret = args.interpret or jax.devices()[0].platform != "tpu"
    if interpret and not args.interpret:
        print("# no TPU: interpret mode (correctness only)", file=sys.stderr)

    rng = np.random.default_rng(0)
    # per-(step, tile) map data: vertical taps land in [LO, HI)
    oy0 = rng.integers(LO, HI - 1, (N, G, TH, TW)).astype(np.int32)
    oy1 = oy0 + 1
    fy = rng.uniform(0, 1, (N, G, TH, TW)).astype(np.float32)
    l0 = rng.integers(0, TW - 1, (N, G, TH, TW)).astype(np.int32)
    l1 = np.minimum(l0 + 1, TW - 1)
    fx = rng.uniform(0, 1, (N, G, TH, TW)).astype(np.float32)
    # one shared window per step (mirrors grouped same-window steps)
    win = rng.integers(0, 255, (N, 1, KH, TW)).astype(np.int32)

    # packed like the production plan: oy pair and l pair int32s
    oyp = (oy0 & 0xFFFF) | (oy1 << 16)
    lp = (l0 & 0xFFFF) | (l1 << 16)
    oyl = np.concatenate(
        [oyp, lp], axis=2
    )  # [N, G, 2*TH, TW]
    fxy = np.concatenate([fx, fy], axis=2)  # [N, G, 2*TH, TW]

    # ---------------- kernel A: production fan body (nc=1, unpaired)

    def kern_fan(oyl_s, fxy_s, win_s, *outs):
        for g in range(G):
            oyv = oyl_s[0, g, :TH, :]
            lv = oyl_s[0, g, TH:, :]
            oy0v = oyv & 0xFFFF
            oy1v = (oyv >> 16) & 0xFFFF
            l0v = lv & 0xFFFF
            l1v = (lv >> 16) & 0xFFFF
            fxv = fxy_s[0, g, :TH, :]
            fyv = fxy_s[0, g, TH:, :]
            wy0 = 1.0 - fyv
            wy1 = fyv
            a0 = 1.0 - fxv
            a1 = fxv
            acc = jnp.zeros((TH, TW), jnp.float32)

            def body(c, acc):
                rowc = win_s[0, 0, pl.ds(c * CHUNK, CHUNK), :]
                for r in range(CHUNK):
                    rep = jnp.broadcast_to(rowc[r : r + 1, :], (TH, TW))
                    s0 = jnp.take_along_axis(rep, l0v, axis=1)
                    s1 = jnp.take_along_axis(rep, l1v, axis=1)
                    k = c * CHUNK + r
                    wk = jnp.where(
                        oy0v == k, wy0, jnp.where(oy1v == k, wy1, 0.0)
                    )
                    mix = s0.astype(jnp.float32) * a0 + s1.astype(
                        jnp.float32
                    ) * a1
                    acc = acc + wk * mix
                return acc

            acc = jax.lax.fori_loop(LO // CHUNK, -(-HI // CHUNK), body, acc)
            outs[g][0] = acc

    # ---------------- kernel B: vertical one-hot matmul + one gather

    KB = -(-(HI - LO) // CHUNK) * CHUNK  # contracted rows, chunk-aligned
    KLO = (LO // CHUNK) * CHUNK

    def kern_mxu(oyl_s, fxy_s, win_s, *outs):
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (KB, TW), 0) + KLO
        rows = win_s[0, 0, pl.ds(KLO, KB), :].astype(jnp.float32)  # [KB, TW]
        for g in range(G):
            oyv = oyl_s[0, g, :TH, :]
            lv = oyl_s[0, g, TH:, :]
            oy0v = oyv & 0xFFFF
            oy1v = (oyv >> 16) & 0xFFFF
            l0v = lv & 0xFFFF
            l1v = (lv >> 16) & 0xFFFF
            fxv = fxy_s[0, g, :TH, :]
            fyv = fxy_s[0, g, TH:, :]
            wy0 = 1.0 - fyv
            wy1 = fyv
            out_rows = []
            for pr in range(TH):
                # one-hot W [KB, TW]: W[k, pc] = wk(pixel (pr, pc), k)
                o0 = jnp.broadcast_to(oy0v[pr : pr + 1, :], (KB, TW))
                o1 = jnp.broadcast_to(oy1v[pr : pr + 1, :], (KB, TW))
                w0 = jnp.broadcast_to(wy0[pr : pr + 1, :], (KB, TW))
                w1 = jnp.broadcast_to(wy1[pr : pr + 1, :], (KB, TW))
                W = jnp.where(o0 == iota_k, w0, 0.0) + jnp.where(
                    o1 == iota_k, w1, 0.0
                )
                # V[pc, c] = sum_k W[k, pc] R[k, c]  (MXU).  Default TPU
                # matmul precision truncates the f32 weights to bf16
                # (~0.5 gray levels of error); HIGHEST keeps f32.
                V = jax.lax.dot_general(
                    W,
                    rows,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # [TW(pc), TW(c)]
                # horizontal: masked lane-reduction (Mosaic's gather
                # lowering does not take per-row indices): fold the
                # horizontal weights into a two-hot mask and row-reduce
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (TW, TW), 1)
                i0 = jnp.broadcast_to(l0v[pr, :][:, None], (TW, TW))
                i1 = jnp.broadcast_to(l1v[pr, :][:, None], (TW, TW))
                a0 = jnp.broadcast_to(
                    (1.0 - fxv[pr, :])[:, None], (TW, TW)
                )
                a1 = jnp.broadcast_to(fxv[pr, :][:, None], (TW, TW))
                Hm = jnp.where(iota_c == i0, a0, 0.0) + jnp.where(
                    iota_c == i1, a1, 0.0
                )
                mix = jnp.sum(V * Hm, axis=1)
                out_rows.append(mix[None, :])
            outs[g][0] = jnp.concatenate(out_rows, axis=0)

    # -------- kernel B2: EXACT one-pass bf16 matmuls — the one-hot is
    # 0/1 (exact in bf16) and the rows are ints <= 255 (exact in bf16),
    # so TWO selection matmuls (oy0-tap and oy1-tap) accumulate in f32
    # with no rounding at default (fast) matmul precision; the per-pixel
    # vertical weights apply on the VPU after the horizontal gather.

    def kern_mxu2(oyl_s, fxy_s, win_s, *outs):
        iota_k = jax.lax.broadcasted_iota(jnp.int32, (KB, TW), 0) + KLO
        rows = win_s[0, 0, pl.ds(KLO, KB), :].astype(jnp.bfloat16)
        for g in range(G):
            oyv = oyl_s[0, g, :TH, :]
            lv = oyl_s[0, g, TH:, :]
            oy0v = oyv & 0xFFFF
            oy1v = (oyv >> 16) & 0xFFFF
            l0v = lv & 0xFFFF
            l1v = (lv >> 16) & 0xFFFF
            fxv = fxy_s[0, g, :TH, :]
            fyv = fxy_s[0, g, TH:, :]
            out_rows = []
            for pr in range(TH):
                o0 = jnp.broadcast_to(oy0v[pr : pr + 1, :], (KB, TW))
                o1 = jnp.broadcast_to(oy1v[pr : pr + 1, :], (KB, TW))
                # f32 select then cast: an i1 select straight into
                # (16,128)-tiled bf16 trips a Mosaic relayout bug
                S0 = jnp.where(o0 == iota_k, 1.0, 0.0).astype(jnp.bfloat16)
                S1 = jnp.where(o1 == iota_k, 1.0, 0.0).astype(jnp.bfloat16)
                V0 = jax.lax.dot_general(
                    S0, rows, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                V1 = jax.lax.dot_general(
                    S1, rows, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                iota_c = jax.lax.broadcasted_iota(jnp.int32, (TW, TW), 1)
                i0 = jnp.broadcast_to(l0v[pr, :][:, None], (TW, TW))
                i1 = jnp.broadcast_to(l1v[pr, :][:, None], (TW, TW))
                a0 = jnp.broadcast_to(
                    (1.0 - fxv[pr, :])[:, None], (TW, TW)
                )
                a1 = jnp.broadcast_to(fxv[pr, :][:, None], (TW, TW))
                Hm = jnp.where(iota_c == i0, a0, 0.0) + jnp.where(
                    iota_c == i1, a1, 0.0
                )
                h0 = jnp.sum(V0 * Hm, axis=1)
                h1 = jnp.sum(V1 * Hm, axis=1)
                mix = h0 * (1.0 - fyv[pr, :]) + h1 * fyv[pr, :]
                out_rows.append(mix[None, :])
            outs[g][0] = jnp.concatenate(out_rows, axis=0)

    # ---------------- harness

    def run(kern, name):
        out_shapes = [
            jax.ShapeDtypeStruct((N, TH, TW), jnp.float32) for _ in range(G)
        ]
        spec_t = pl.BlockSpec((1, G, 2 * TH, TW), lambda i: (i, 0, 0, 0))
        spec_w = pl.BlockSpec((1, 1, KH, TW), lambda i: (i, 0, 0, 0))
        spec_o = pl.BlockSpec((1, TH, TW), lambda i: (i, 0, 0))
        f = pl.pallas_call(
            kern,
            grid=(N,),
            in_specs=[spec_t, spec_t, spec_w],
            out_specs=[spec_o] * G,
            out_shape=out_shapes,
            interpret=interpret,
        )
        f = jax.jit(f)
        a = jax.device_put(oyl)
        b = jax.device_put(fxy)
        c = jax.device_put(win)
        t0 = time.time()
        outs = f(a, b, c)
        jax.block_until_ready(outs)
        print(f"# {name}: first call {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        for _ in range(args.iters):
            outs = f(a, b, c)
        chk = float(jnp.sum(outs[0][::7, :, ::11]))
        dt = (time.time() - t0) / args.iters * 1e3
        print(f"# {name}: {dt:.2f} ms  (checksum {chk:.1f})")
        return outs, dt

    outs_a, ms_a = run(kern_fan, "A fan (production body)")
    outs_b, ms_b = run(kern_mxu, "B mxu (folded f32 weights, HIGHEST)")
    outs_b2, ms_b2 = run(kern_mxu2, "B2 mxu (exact bf16 selections x2)")
    err = max(
        float(jnp.abs(oa - ob).max()) for oa, ob in zip(outs_a, outs_b)
    )
    err2 = max(
        float(jnp.abs(oa - ob).max()) for oa, ob in zip(outs_a, outs_b2)
    )
    print(f"# max |A-B| = {err:.2e}   max |A-B2| = {err2:.2e}")
    assert err < 2e-2, "B disagrees"
    assert err2 < 1e-3, "B2 disagrees"
    import json

    print(
        json.dumps(
            {
                "metric": "mxu_taps_probe",
                "steps": N,
                "g": G,
                "kh": KH,
                "visited_rows": HI - LO,
                "fan_ms": round(ms_a, 2),
                "mxu_folded_ms": round(ms_b, 2),
                "mxu_exact2_ms": round(ms_b2, 2),
                "speedup_folded": round(ms_a / ms_b, 3),
                "speedup_exact2": round(ms_a / ms_b2, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
