"""Registration RANSAC fan-out timing: per-pair host loop vs the
one-device-call batched path (VERDICT r2 item 7).

The reference parallelizes the pairwise match fan-out over CPU threads
(stitching/src/matchers.cpp:530-555); our equivalent batches hypothesis
generation + scoring for EVERY pair into one jitted program
(registration/matchers._ransac_score_batch), leaving only the final
inlier refits on host.

Usage: python tools/ransac_bench.py [n_cams]  (default 12)
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12

    import jax.numpy as jnp
    from test_registration import render_view, yaw_cameras

    from octvr_tpu.registration.features import detect_and_describe
    from octvr_tpu.registration.matchers import (
        _pairs_from_nn,
        _ransac_score_batch,
        _refit_inliers,
        _two_nn_batch,
        find_homography_ransac,
    )

    f, w, h = 380.0, 400, 300
    step = 360.0 / n
    images = [render_view(R, f, w, h) for R in yaw_cameras(n, step, f)]
    feats = []
    for img in images:
        gray = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        feats.append(detect_and_describe(jnp.asarray(gray), max_features=400))

    # shared 2-NN fan-out (identical in both paths)
    pair_list = [(i, j) for i in range(n) for j in range(i + 1, n)]
    kmax = max(np.asarray(ft.descriptors).shape[0] for ft in feats)

    def padk(a, fill=0.0):
        a = np.asarray(a)
        if a.shape[0] == kmax:
            return a
        pad = np.full((kmax - a.shape[0],) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad])

    desc = np.stack([padk(ft.descriptors) for ft in feats])
    val = np.stack([padk(np.asarray(ft.valid), False) for ft in feats])
    ii = np.array([p[0] for p in pair_list])
    jj = np.array([p[1] for p in pair_list])
    d12, i12 = _two_nn_batch(desc[ii], val[ii], desc[jj], val[jj])
    d21, i21 = _two_nn_batch(desc[jj], val[jj], desc[ii], val[ii])
    d12, i12, d21, i21 = (np.asarray(a) for a in (d12, i12, d21, i21))

    corr = []
    for p, (i, j) in enumerate(pair_list):
        pairs, _ = _pairs_from_nn(d12[p], i12[p], d21[p], i21[p], 0.3)
        if len(pairs) < 6:
            continue
        k1 = np.asarray(feats[i].keypoints)
        k2 = np.asarray(feats[j].keypoints)
        src = k1[pairs[:, 0]] - np.array([w * 0.5, h * 0.5])
        dst = k2[pairs[:, 1]] - np.array([w * 0.5, h * 0.5])
        corr.append(((i, j), src, dst))
    print(f"{n} cams, {len(pair_list)} pairs, {len(corr)} with >=6 matches")

    # -------- before: per-pair host loop (round-2 code path) ----------
    t0 = time.perf_counter()
    n_ok_loop = 0
    for (i, j), src, dst in corr:
        H, inl = find_homography_ransac(src, dst, seed=i * n + j)
        n_ok_loop += H is not None
    t_loop = time.perf_counter() - t0

    # -------- after: one device call + host refits ---------------------
    def batched():
        iters, thresh = 1024, 3.0
        mmax = max(len(s) for _, s, _ in corr)
        P = len(corr)
        rng = np.random.default_rng(0)
        src_b = np.zeros((P, mmax, 2), np.float32)
        dst_b = np.zeros((P, mmax, 2), np.float32)
        val_b = np.zeros((P, mmax), bool)
        smp_b = np.zeros((P, iters, 4), np.int32)
        for p, (_, s, d) in enumerate(corr):
            m = len(s)
            src_b[p, :m] = s
            dst_b[p, :m] = d
            val_b[p, :m] = True
            smp_b[p] = rng.integers(0, m, size=(iters, 4))
        masks, counts = _ransac_score_batch(src_b, dst_b, val_b, smp_b, thresh)
        masks, counts = np.asarray(masks), np.asarray(counts)
        ok = 0
        for p, (_, src, dst) in enumerate(corr):
            if counts[p] < 4:
                continue
            H, _ = _refit_inliers(src, dst, masks[p, : len(src)], thresh, 4)
            ok += H is not None
        return ok

    n_ok_warm = batched()  # includes jit compile
    t0 = time.perf_counter()
    n_ok_batch = batched()
    t_batch = time.perf_counter() - t0

    assert n_ok_batch == n_ok_warm
    print(
        f"per-pair host loop:  {t_loop * 1e3:8.1f} ms ({n_ok_loop} H found)"
    )
    print(
        f"batched device call: {t_batch * 1e3:8.1f} ms ({n_ok_batch} H found)"
        f"   speedup {t_loop / t_batch:.2f}x"
    )


if __name__ == "__main__":
    main()
