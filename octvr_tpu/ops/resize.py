"""Image resize with OpenCV-compatible sampling semantics.

The reference pipeline resizes constantly (working-scale gain images at
0.1 MP, seam masks at <=960 px, previews, vignette maps); parity requires
cv::resize's half-pixel-center bilinear (INTER_LINEAR) and floor-based
nearest (INTER_NEAREST).  Implemented as pure gather/lerp array math; works
with numpy and jax.numpy, for [H, W] or [H, W, C] arrays.
"""

import numpy as np

__all__ = ["resize_bilinear", "resize_nearest", "resize_area"]


def _axes_coords(dst, src, xp):
    # INTER_LINEAR mapping: sx = (dx + 0.5) * scale - 0.5
    scale = src / dst
    return (xp.arange(dst, dtype=np.float32) + 0.5) * scale - 0.5


def resize_bilinear(img, out_h, out_w, xp=np):
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    fy = _axes_coords(out_h, h, xp)
    fx = _axes_coords(out_w, w, xp)
    y0 = xp.clip(xp.floor(fy), 0, h - 1).astype(np.int32)
    x0 = xp.clip(xp.floor(fx), 0, w - 1).astype(np.int32)
    y1 = xp.clip(y0 + 1, 0, h - 1)
    x1 = xp.clip(x0 + 1, 0, w - 1)
    wy = xp.clip(fy - y0.astype(np.float32), 0.0, 1.0)
    wx = xp.clip(fx - x0.astype(np.float32), 0.0, 1.0)

    work = img.astype(np.float32)
    r0 = work[y0][:, x0]
    r1 = work[y0][:, x1]
    r2 = work[y1][:, x0]
    r3 = work[y1][:, x1]
    if img.ndim == 3:
        wy_ = wy[:, None, None]
        wx_ = wx[None, :, None]
    else:
        wy_ = wy[:, None]
        wx_ = wx[None, :]
    top = r0 * (1 - wx_) + r1 * wx_
    bot = r2 * (1 - wx_) + r3 * wx_
    out = top * (1 - wy_) + bot * wy_
    if np.issubdtype(img.dtype, np.integer):
        out = xp.clip(xp.round(out), 0, 255).astype(img.dtype)
    return out


def resize_nearest(img, out_h, out_w, xp=np):
    h, w = img.shape[:2]
    if (h, w) == (out_h, out_w):
        return img
    # INTER_NEAREST mapping: sx = floor(dx * scale)
    ys = xp.clip(
        xp.floor(xp.arange(out_h, dtype=np.float32) * (h / out_h)), 0, h - 1
    ).astype(np.int32)
    xs = xp.clip(
        xp.floor(xp.arange(out_w, dtype=np.float32) * (w / out_w)), 0, w - 1
    ).astype(np.int32)
    return img[ys][:, xs]


def resize_area(img, out_h, out_w, xp=np):
    """Integer-factor box downsample (used for working-scale thumbnails when
    exact cv parity is not required)."""
    h, w = img.shape[:2]
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        shape = (out_h, fh, out_w, fw) + img.shape[2:]
        return img.reshape(shape).mean(axis=(1, 3))
    return resize_bilinear(img, out_h, out_w, xp=xp)
