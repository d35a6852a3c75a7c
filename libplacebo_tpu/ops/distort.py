"""Affine distortion (reference pl_shader_distort, sampling.c:1108).

The reference renders a quad whose fragment shader inverse-maps each
output pixel through a 2x2 affine transform (+canvas normalization) and
samples the source bilinearly/bicubically with a configurable address
mode.  Here the inverse mapping is computed as HOST numpy coordinate
grids (the transform is static per signature) and the sampling is a
jnp gather — the one pattern this codebase otherwise avoids, accepted
for this utility: distortion is an occasional effect (plplay UI spins,
pan-and-scan), not part of the hot scaling path, and a 2-4 Mpx gather
at 4-16 taps is ~mss, not the 25M-index pathology of the LUT case.

Geometry follows the reference exactly (sampling.c:1115-1160): the
source is aspect-normalized so its longer dimension spans [-1, 1], the
user transform applies in that space, and the result maps onto a
[-1, 1]^2 canvas (y up); `unscaled` keeps source pixels 1:1 with canvas
pixels, `constrain` shrinks the transform so the mapped source fits the
canvas.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

__all__ = ["DistortParams", "distort_image"]


@dataclass(frozen=True)
class DistortParams:
    """Reference pl_distort_params (shaders/sampling.h:204-236)."""
    # row-major 2x2 matrix ((a, b), (c, d)) + offset (x, y)
    transform: Tuple[Tuple[float, float], Tuple[float, float]] = \
        ((1.0, 0.0), (0.0, 1.0))
    offset: Tuple[float, float] = (0.0, 0.0)
    unscaled: bool = False
    constrain: bool = False
    bicubic: bool = False
    address_mode: str = "clamp"          # clamp | repeat | mirror
    alpha_mode: Optional[str] = None     # None | "independent" |
    #                                      "premultiplied": OOB -> alpha 0

    def key(self):
        return (self.transform, self.offset, self.unscaled, self.constrain,
                self.bicubic, self.address_mode, self.alpha_mode)

    @staticmethod
    def rotation(radians: float) -> "DistortParams":
        c, s = math.cos(radians), math.sin(radians)
        return DistortParams(transform=((c, -s), (s, c)))


def _wrap(idx: np.ndarray, size: int, mode: str) -> np.ndarray:
    if mode == "repeat":
        return np.mod(idx, size)
    if mode == "mirror":
        period = 2 * size
        m = np.mod(idx, period)
        return np.where(m >= size, period - 1 - m, m)
    return np.clip(idx, 0, size - 1)     # clamp


def _cubic_weights(t: np.ndarray):
    """Catmull-Rom weights for the 4-tap axis (matches GPU bicubic
    filtering conventions)."""
    t2, t3 = t * t, t * t * t
    w0 = -0.5 * t3 + t2 - 0.5 * t
    w1 = 1.5 * t3 - 2.5 * t2 + 1.0
    w2 = -1.5 * t3 + 2.0 * t2 + 0.5 * t
    w3 = 0.5 * t3 - 0.5 * t2
    return w0, w1, w2, w3


def distort_image(img, out_w: int, out_h: int, params: DistortParams):
    """Distort (..., C, H, W) -> (..., C|C+1, out_h, out_w).

    With params.alpha_mode set, an alpha channel encoding out-of-bounds
    coverage is appended (premultiplied multiplies the color through).
    """
    src_h, src_w = img.shape[-2], img.shape[-1]

    # aspect normalization: longer source dimension spans [-1, 1]
    rx, ry = 1.0, 1.0
    if src_w > src_h:
        ry = src_h / src_w
    else:
        rx = src_w / src_h
    # tex2norm: [0,1]^2 -> aspect space (y flipped)
    t2n = np.array([[2 * rx, 0.0], [0.0, -2 * ry]])
    t2n_c = np.array([-rx, ry])
    # norm2canvas
    sx = src_w / out_w if params.unscaled else 1.0
    sy = src_h / out_h if params.unscaled else 1.0
    n2c = np.array([[sx / rx, 0.0], [0.0, sy / ry]])

    user = np.asarray(params.transform, np.float64)
    user_c = np.asarray(params.offset, np.float64)
    M = n2c @ user @ t2n
    c = n2c @ (user @ t2n_c + user_c)

    if params.constrain:
        # bounds of [0,1]^2 under (M, c)
        corners = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float64)
        mapped = corners @ M.T + c
        bb_w = mapped[:, 0].max() - mapped[:, 0].min()
        bb_h = mapped[:, 1].max() - mapped[:, 1].min()
        k = max(bb_w, bb_h, 2.0)
        scale = 2.0 / k
        M = M * scale
        c = c * scale

    # canvas coordinates: x in [-1,1], y in [1,-1] (y up), pixel centers
    xs = (np.arange(out_w) + 0.5) / out_w * 2.0 - 1.0
    ys = 1.0 - (np.arange(out_h) + 0.5) / out_h * 2.0
    cy, cx = np.meshgrid(ys, xs, indexing="ij")

    # invert: tex = M^-1 (canvas - c).  A degenerate user transform
    # (e.g. distort_scale_x=0) has no inverse mapping — raise the
    # renderer's clear error instead of leaking numpy's LinAlgError
    # (honest degradation: user errors propagate with context)
    if abs(np.linalg.det(M)) < 1e-12:
        from ..render.renderer import RenderError
        raise RenderError(
            "distortion transform is singular (det ~ 0); check "
            "distort_scale_x/y and shear values")
    Minv = np.linalg.inv(M)
    u = Minv[0, 0] * (cx - c[0]) + Minv[0, 1] * (cy - c[1])
    v = Minv[1, 0] * (cx - c[0]) + Minv[1, 1] * (cy - c[1])
    # [0,1]^2 texel space -> pixel indices
    px = u * src_w - 0.5
    py = v * src_h - 0.5

    oob = (u < 0.0) | (u > 1.0) | (v < 0.0) | (v > 1.0)

    x0 = np.floor(px).astype(np.int64)
    y0 = np.floor(py).astype(np.int64)
    fx = (px - x0).astype(np.float32)
    fy = (py - y0).astype(np.float32)

    mode = params.address_mode

    def tap(dy: int, dx: int):
        yy = _wrap(y0 + dy, src_h, mode)
        xx = _wrap(x0 + dx, src_w, mode)
        flat = jnp.asarray((yy * src_w + xx).ravel())
        g = jnp.take(img.reshape(*img.shape[:-2], src_h * src_w),
                     flat, axis=-1)
        return g.reshape(*img.shape[:-2], out_h, out_w)

    fxj = jnp.asarray(fx)
    fyj = jnp.asarray(fy)
    if params.bicubic:
        wx = _cubic_weights(fxj)
        wy = _cubic_weights(fyj)
        out = None
        for jy, wyv in enumerate(wy):
            row = None
            for jx, wxv in enumerate(wx):
                t = tap(jy - 1, jx - 1) * wxv
                row = t if row is None else row + t
            term = row * wyv
            out = term if out is None else out + term
    else:
        t00, t01 = tap(0, 0), tap(0, 1)
        t10, t11 = tap(1, 0), tap(1, 1)
        top = t00 + (t01 - t00) * fxj
        bot = t10 + (t11 - t10) * fxj
        out = top + (bot - top) * fyj

    if params.alpha_mode:
        alpha = jnp.asarray((~oob).astype(np.float32))[None]
        alpha = jnp.broadcast_to(alpha, out.shape[:-3] + (1,) +
                                 out.shape[-2:])
        if params.alpha_mode == "premultiplied":
            out = out * alpha
        out = jnp.concatenate([out, alpha], axis=-3)
    elif mode == "clamp":
        # plain clamp keeps the edge-extended samples (GPU clamp-to-edge)
        pass
    return out
