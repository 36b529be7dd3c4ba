"""Graph-cut seam finder (content-aware): pairwise min-cut over the
overlap region, COST_COLOR terms — the GraphCutSeamFinder role
(stitching/src/seam_finders.cpp:1235-1410), built on
scipy.sparse.csgraph.maximum_flow instead of GCGraph.

Pairwise like the stock finder: for every overlapping image pair, solve
one min-cut where the terminal costs pin pixels owned exclusively by one
image and the edge weights are color differences, then zero the losing
mask pixels.
"""

import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import maximum_flow

__all__ = ["graphcut_seam_find"]

_INF = 10**9
_SCALE = 1000.0  # float costs -> int capacities


def _color_diff(a, b):
    return np.sqrt(np.sum((a.astype(np.float64) - b.astype(np.float64)) ** 2, -1))


def _pair_cut(img1, img2, m1, m2, ox, oy, ow, oh):
    """Min-cut over the overlap rect; returns keep1 mask over the rect
    (True = pixel stays with image 1)."""
    n = ow * oh
    src, dst = n, n + 1
    idx = np.arange(n).reshape(oh, ow)

    d = _color_diff(img1, img2)  # [oh, ow]

    # terminal links: pixels covered only by img1 -> source, only img2 -> sink
    only1 = idx[(m1 > 0) & ~(m2 > 0)]
    only2 = idx[(m2 > 0) & ~(m1 > 0)]

    # neighbor links: weight = color diff at both ends (seam_finders.cpp
    # setGraphWeightsColor), quantized
    wgt_h = ((d[:, :-1] + d[:, 1:]) * _SCALE + 1).astype(np.int64).ravel()
    wgt_v = ((d[:-1, :] + d[1:, :]) * _SCALE + 1).astype(np.int64).ravel()
    uh, vh = idx[:, :-1].ravel(), idx[:, 1:].ravel()
    uv, vv = idx[:-1, :].ravel(), idx[1:, :].ravel()

    rows = np.concatenate(
        [
            np.full(len(only1), src),
            only2,
            uh,
            vh,
            uv,
            vv,
        ]
    )
    cols = np.concatenate(
        [
            only1,
            np.full(len(only2), dst),
            vh,
            uh,
            vv,
            uv,
        ]
    )
    caps = np.concatenate(
        [
            np.full(len(only1), _INF, dtype=np.int64),
            np.full(len(only2), _INF, dtype=np.int64),
            wgt_h,
            wgt_h,
            wgt_v,
            wgt_v,
        ]
    )
    g = csr_matrix((caps, (rows, cols)), shape=(n + 2, n + 2))
    res = maximum_flow(g, src, dst)
    # source side = pixels reachable from src in the residual graph
    residual = g - res.flow
    residual.data = np.maximum(residual.data, 0)
    from scipy.sparse.csgraph import breadth_first_order

    order = breadth_first_order(
        residual, src, directed=True, return_predecessors=False
    )
    source_side = np.zeros(n + 2, dtype=bool)
    source_side[order] = True
    return source_side[:n].reshape(oh, ow)


def graphcut_seam_find(images, masks, corners):
    """images: float [h, w, 3] in [0,1] per input (roi-sized); masks: u8;
    corners: (x, y) canvas offsets.  Returns updated masks."""
    masks = [np.array(m, dtype=np.uint8, copy=True) for m in masks]
    n = len(masks)
    for i in range(n):
        for j in range(i + 1, n):
            xi, yi = corners[i]
            xj, yj = corners[j]
            hi, wi = masks[i].shape
            hj, wj = masks[j].shape
            ox0 = max(xi, xj)
            oy0 = max(yi, yj)
            ox1 = min(xi + wi, xj + wj)
            oy1 = min(yi + hi, yj + hj)
            if ox1 <= ox0 or oy1 <= oy0:
                continue
            ow, oh = ox1 - ox0, oy1 - oy0
            si = (slice(oy0 - yi, oy0 - yi + oh), slice(ox0 - xi, ox0 - xi + ow))
            sj = (slice(oy0 - yj, oy0 - yj + oh), slice(ox0 - xj, ox0 - xj + ow))
            mi = masks[i][si]
            mj = masks[j][sj]
            both = (mi > 0) & (mj > 0)
            if not both.any():
                continue
            keep1 = _pair_cut(
                np.asarray(images[i])[si],
                np.asarray(images[j])[sj],
                mi,
                mj,
                ox0,
                oy0,
                ow,
                oh,
            )
            mi[both & ~keep1] = 0
            mj[both & keep1] = 0
    return masks
