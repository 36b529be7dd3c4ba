"""Rotation warper family — the stitching module's RotationWarperBase
projectors (stitching/include/.../warpers_inl.hpp:214-680), vectorized.

Each projector maps camera rays (through R K^-1) to a 2-D projection
plane and back.  ``build_maps`` produces backward maps compatible with
the engine's remap machinery (normalized coords, -1 invalid), so warped
images can be produced by the same CPU/XLA/Pallas gather paths.
"""

import math
from dataclasses import dataclass

import numpy as np

PI = math.pi

__all__ = [
    "RotationWarper",
    "PROJECTORS",
    "make_warper",
]


# Every projector: fwd(dir) -> (u, v) plane coords (unscaled);
# bwd(u, v) -> unit direction [..., 3]; directions are camera rays in the
# common world frame (x right, y down, z forward).


def _sph_angles(d, xp):
    x_, y_, z_ = d[..., 0], d[..., 1], d[..., 2]
    u_ = xp.arctan2(x_, z_)
    w = y_ / xp.sqrt(x_ * x_ + y_ * y_ + z_ * z_)
    return u_, xp.clip(w, -1.0, 1.0)


class _Spherical:
    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        return u_, PI - xp.arccos(w)

    def bwd(self, u, v, xp):
        sinv = xp.sin(PI - v)
        return xp.stack(
            [sinv * xp.sin(u), xp.cos(PI - v), sinv * xp.cos(u)], -1
        )


class _Cylindrical:
    def fwd(self, d, xp):
        x_, y_, z_ = d[..., 0], d[..., 1], d[..., 2]
        return xp.arctan2(x_, z_), y_ / xp.sqrt(x_ * x_ + z_ * z_)

    def bwd(self, u, v, xp):
        return xp.stack([xp.sin(u), v, xp.cos(u)], -1)


class _Plane:
    def fwd(self, d, xp):
        x_, y_, z_ = d[..., 0], d[..., 1], d[..., 2]
        zs = xp.where(xp.abs(z_) > 1e-12, z_, 1e-12)
        return x_ / zs, y_ / zs

    def bwd(self, u, v, xp):
        return xp.stack([u, v, xp.ones_like(u)], -1)


class _Fisheye:
    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        v_ = PI - xp.arccos(w)
        return v_ * xp.cos(u_), v_ * xp.sin(u_)

    def bwd(self, u, v, xp):
        u_ = xp.arctan2(v, u)
        v_ = xp.sqrt(u * u + v * v)
        sinv = xp.sin(PI - v_)
        return xp.stack(
            [sinv * xp.sin(u_), xp.cos(PI - v_), sinv * xp.cos(u_)], -1
        )


class _Stereographic:
    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        v_ = PI - xp.arccos(w)
        r = xp.sin(v_) / (1.0 - xp.cos(v_))
        return r * xp.cos(u_), r * xp.sin(u_)

    def bwd(self, u, v, xp):
        u_ = xp.arctan2(v, u)
        r = xp.sqrt(u * u + v * v)
        v_ = 2.0 * xp.arctan(1.0 / xp.where(r > 1e-12, r, 1e-12))
        sinv = xp.sin(PI - v_)
        return xp.stack(
            [sinv * xp.sin(u_), xp.cos(PI - v_), sinv * xp.cos(u_)], -1
        )


@dataclass
class _CompressedRectilinear:
    a: float = 1.0
    b: float = 1.0

    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        v_ = xp.arcsin(w)
        return (
            self.a * xp.tan(u_ / self.a),
            self.b * xp.tan(v_) / xp.cos(u_),
        )

    def bwd(self, u, v, xp):
        aatg = self.a * xp.arctan(u / self.a)
        u_ = aatg
        v_ = xp.arctan(v * xp.cos(aatg) / self.b)
        cosv = xp.cos(v_)
        return xp.stack(
            [cosv * xp.sin(u_), xp.sin(v_), cosv * xp.cos(u_)], -1
        )


@dataclass
class _Panini:
    a: float = 1.0
    b: float = 1.0

    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        v_ = xp.arcsin(w)
        tg = self.a * xp.tan(u_ / self.a)
        sinu = xp.sin(u_)
        vv = xp.where(
            xp.abs(sinu) < 1e-7,
            self.b * xp.tan(v_),
            self.b * tg * xp.tan(v_) / xp.where(xp.abs(sinu) < 1e-7, 1.0, sinu),
        )
        return tg, vv

    def bwd(self, u, v, xp):
        lam = self.a * xp.arctan(u / self.a)
        u_ = lam
        denom = self.b * self.a * xp.tan(lam / self.a)
        v_ = xp.where(
            xp.abs(lam) > 1e-7,
            xp.arctan(
                v * xp.sin(lam) / xp.where(xp.abs(denom) > 1e-12, denom, 1.0)
            ),
            xp.arctan(v / self.b),
        )
        cosv = xp.cos(v_)
        return xp.stack(
            [cosv * xp.sin(u_), xp.sin(v_), cosv * xp.cos(u_)], -1
        )


class _Mercator:
    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        v_ = xp.arcsin(w)
        return u_, xp.log(xp.tan(PI / 4 + v_ / 2))

    def bwd(self, u, v, xp):
        v_ = xp.arctan(xp.sinh(v))
        cosv = xp.cos(v_)
        return xp.stack(
            [cosv * xp.sin(u), xp.sin(v_), cosv * xp.cos(u)], -1
        )


class _TransverseMercator:
    def fwd(self, d, xp):
        u_, w = _sph_angles(d, xp)
        v_ = xp.arcsin(w)
        B = xp.clip(xp.cos(v_) * xp.sin(u_), -1 + 1e-7, 1 - 1e-7)
        return 0.5 * xp.log((1 + B) / (1 - B)), xp.arctan2(
            xp.tan(v_), xp.cos(u_)
        )

    def bwd(self, u, v, xp):
        v_ = xp.arcsin(xp.clip(xp.sin(v) / xp.cosh(u), -1.0, 1.0))
        u_ = xp.arctan2(xp.sinh(u), xp.cos(v))
        cosv = xp.cos(v_)
        return xp.stack(
            [cosv * xp.sin(u_), xp.sin(v_), cosv * xp.cos(u_)], -1
        )


class _Portrait:
    """Portrait variants swap the x/y ray components and negate u
    (warpers_inl.hpp:637-680)."""

    def __init__(self, base):
        self.base = base

    def fwd(self, d, xp):
        swapped = xp.stack([d[..., 1], d[..., 0], d[..., 2]], -1)
        u, v = self.base.fwd(swapped, xp)
        return -u, v

    def bwd(self, u, v, xp):
        d = self.base.bwd(-u, v, xp)
        return xp.stack([d[..., 1], d[..., 0], d[..., 2]], -1)


PROJECTORS = {
    "plane": _Plane,
    "spherical": _Spherical,
    "cylindrical": _Cylindrical,
    "fisheye": _Fisheye,
    "stereographic": _Stereographic,
    "compressedPlaneA2B1": lambda: _CompressedRectilinear(2.0, 1.0),
    "compressedPlaneA1.5B1": lambda: _CompressedRectilinear(1.5, 1.0),
    "compressedPlanePortraitA2B1": lambda: _Portrait(
        _CompressedRectilinear(2.0, 1.0)
    ),
    "compressedPlanePortraitA1.5B1": lambda: _Portrait(
        _CompressedRectilinear(1.5, 1.0)
    ),
    "paniniA2B1": lambda: _Panini(2.0, 1.0),
    "paniniA1.5B1": lambda: _Panini(1.5, 1.0),
    "paniniPortraitA2B1": lambda: _Portrait(_Panini(2.0, 1.0)),
    "paniniPortraitA1.5B1": lambda: _Portrait(_Panini(1.5, 1.0)),
    "mercator": _Mercator,
    "transverseMercator": _TransverseMercator,
    "sphericalPortrait": lambda: _Portrait(_Spherical()),
    "cylindricalPortrait": lambda: _Portrait(_Cylindrical()),
    "planePortrait": lambda: _Portrait(_Plane()),
}


class RotationWarper:
    """buildMaps/warp/warpPoint/warpRoi over a projector
    (RotationWarperBase, warpers_inl.hpp:52-210)."""

    def __init__(self, kind, scale):
        proj = PROJECTORS[kind]
        self.projector = proj() if callable(proj) else proj
        self.scale = float(scale)
        self.kind = kind

    # ------------------------------------------------------------ helpers

    def _fwd_points(self, pts, K, R, xp=np):
        r_kinv = np.asarray(R) @ np.linalg.inv(np.asarray(K))
        d = pts @ r_kinv.T
        u, v = self.projector.fwd(d, xp)
        return u * self.scale, v * self.scale

    def warp_point(self, pt, K, R):
        p = np.array([[pt[0], pt[1], 1.0]])
        u, v = self._fwd_points(p, K, R)
        return float(u[0]), float(v[0])

    def detect_result_roi(self, src_size, K, R):
        """Forward-project the source border -> dst bounding box
        (detectResultRoiByBorder)."""
        w, h = src_size
        xs = np.arange(w, dtype=np.float64)
        ys = np.arange(h, dtype=np.float64)
        border = np.concatenate(
            [
                np.stack([xs, np.zeros_like(xs)], -1),
                np.stack([xs, np.full_like(xs, h - 1)], -1),
                np.stack([np.zeros_like(ys), ys], -1),
                np.stack([np.full_like(ys, w - 1), ys], -1),
            ]
        )
        pts = np.concatenate([border, np.ones((len(border), 1))], -1)
        u, v = self._fwd_points(pts, K, R)
        ok = np.isfinite(u) & np.isfinite(v)
        tl = (int(u[ok].min()), int(v[ok].min()))
        br = (int(u[ok].max()), int(v[ok].max()))
        return tl, br

    def build_maps(self, src_size, K, R):
        """Returns (dst_tl, map1, map2): normalized backward maps into the
        source image (-1 invalid), ready for the remap paths."""
        w, h = src_size
        tl, br = self.detect_result_roi(src_size, K, R)
        dw = br[0] - tl[0] + 1
        dh = br[1] - tl[1] + 1
        us, vs = np.meshgrid(
            (np.arange(dw) + tl[0]) / self.scale,
            (np.arange(dh) + tl[1]) / self.scale,
        )
        d = self.projector.bwd(us, vs, np)
        k_rinv = np.asarray(K) @ np.linalg.inv(np.asarray(R))
        p = d @ k_rinv.T
        z = p[..., 2]
        ok = z > 0
        zs = np.where(ok, z, 1.0)
        x = p[..., 0] / zs
        y = p[..., 1] / zs
        ok &= (x >= -0.5) & (x < w - 0.5) & (y >= -0.5) & (y < h - 0.5)
        # normalized texture coords (+0.5 pixel-center shift)
        m1 = np.where(ok, (x + 0.5) / w, -1.0).astype(np.float32)
        m2 = np.where(ok, (y + 0.5) / h, -1.0).astype(np.float32)
        return tl, m1, m2

    def warp(self, img, K, R):
        """CPU warp (offline compose path).  Returns (dst_tl, warped,
        mask)."""
        from ..template.compiler import _remap_image_cpu

        h, w = img.shape[:2]
        tl, m1, m2 = self.build_maps((w, h), K, R)
        warped = _remap_image_cpu(img, m1, m2)
        mask = ((m1 >= 0) * 255).astype(np.uint8)
        return tl, warped, mask

    def warp_roi(self, src_size, K, R):
        tl, br = self.detect_result_roi(src_size, K, R)
        return (tl[0], tl[1], br[0] - tl[0] + 1, br[1] - tl[1] + 1)


def make_warper(kind, scale):
    return RotationWarper(kind, scale)
