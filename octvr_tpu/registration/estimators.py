"""Camera parameter containers, rotation propagation, graph utilities.

Covers HomographyBasedEstimator (motion_estimators.cpp:105-174),
findMaxSpanningTree (:812) and leaveBiggestComponent
(motion_estimators.cpp:753) — host-side graph code (numpy), producing
arrays that feed the jit/BA paths.
"""

from dataclasses import dataclass, field

import numpy as np

from .autocalib import estimate_focal

__all__ = [
    "CameraParams",
    "max_spanning_tree",
    "leave_biggest_component",
    "estimate_rotations",
]


@dataclass
class CameraParams:
    focal: float = 1.0
    aspect: float = 1.0
    ppx: float = 0.0
    ppy: float = 0.0
    R: np.ndarray = field(default_factory=lambda: np.eye(3))

    def K(self):
        return np.array(
            [
                [self.focal, 0, self.ppx],
                [0, self.focal * self.aspect, self.ppy],
                [0, 0, 1],
            ]
        )


def _edge_weight(mi):
    return mi.num_inliers


def max_spanning_tree(n, matches):
    """Prim over num_inliers weights.  Returns (edges as (from, to) in BFS
    order from the tree center, centers list)."""
    # adjacency with weights
    adj = np.zeros((n, n), dtype=np.int64)
    for (i, j), mi in matches.items():
        if mi.H is not None:
            adj[i, j] = adj[j, i] = _edge_weight(mi)

    in_tree = np.zeros(n, dtype=bool)
    in_tree[0] = True
    tree_edges = []
    for _ in range(n - 1):
        best, bi, bj = -1, -1, -1
        for i in np.flatnonzero(in_tree):
            for j in np.flatnonzero(~in_tree):
                if adj[i, j] > best:
                    best, bi, bj = adj[i, j], i, j
        if best <= 0:
            break
        in_tree[bj] = True
        tree_edges.append((bi, bj))

    # adjacency of the tree
    nbrs = [[] for _ in range(n)]
    for i, j in tree_edges:
        nbrs[i].append(j)
        nbrs[j].append(i)

    # centers: nodes minimizing eccentricity (util.cpp findMaxSpanningTree
    # returns power-center nodes; BFS eccentricity works the same here)
    def ecc(start):
        dist = {start: 0}
        q = [start]
        while q:
            u = q.pop(0)
            for v in nbrs[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return max(dist.values()) if dist else 0

    eccs = [ecc(i) for i in range(n)]
    m = min(eccs)
    centers = [i for i in range(n) if eccs[i] == m]

    # BFS edge order from the first center
    order = []
    seen = {centers[0]}
    q = [centers[0]]
    while q:
        u = q.pop(0)
        for v in nbrs[u]:
            if v not in seen:
                seen.add(v)
                order.append((u, v))
                q.append(v)
    return order, centers


def leave_biggest_component(n, matches, conf_thresh=1.0):
    """Indices of the largest connected component under the confidence
    threshold (motion_estimators.cpp:753-810)."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i, j), mi in matches.items():
        if mi.confidence > conf_thresh:
            parent[find(i)] = find(j)
    comps = {}
    for i in range(n):
        comps.setdefault(find(i), []).append(i)
    return sorted(max(comps.values(), key=len))


def estimate_rotations(features, matches, focals=None):
    """HomographyBasedEstimator: focals from homographies + rotation
    propagation over the max spanning tree,
    R_to = R_from @ K_from^-1 @ H^-1 @ K_to (motion_estimators.cpp:60-88).
    Principal points at the image center (ppx/ppy = 0 in the centered
    frame the matcher used)."""
    n = len(features)
    if focals is None:
        focals = estimate_focal(features, matches)
    cams = [CameraParams(focal=f) for f in focals]

    order, centers = max_spanning_tree(n, matches)
    for u, v in order:
        if (u, v) in matches and matches[(u, v)].H is not None:
            H = matches[(u, v)].H
        else:
            H = np.linalg.inv(matches[(v, u)].H)
        r = np.linalg.inv(cams[u].K()) @ np.linalg.inv(H) @ cams[v].K()
        cams[v].R = cams[u].R @ r
    return cams, centers
