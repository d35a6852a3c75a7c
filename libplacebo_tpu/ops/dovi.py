"""Dolby Vision reshaping (RPU polynomial / MMR).

TPU-native rebuild of pl_shader_dovi_reshape
(src/shaders/colorspace.c:106-260): per-component piecewise reshaping
with up to 8 segments, each either a quadratic polynomial or an MMR
(multivariate multiple regression) expansion of order <= 3 over the
(Y, Cb, Cr) triple.  The reference selects segments with a nested-mix
binary tree in GLSL; here it's a masked sum over segments — all
elementwise VPU math, fused by XLA.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.colorspace import DoviMetadata

__all__ = ["dovi_reshape"]


def _mmr_eval(sig0, sig1, sig2, const, coeffs, order: int):
    """MMR expansion (reference reshape_mmr, colorspace.c:52-98).
    coeffs: (order, 7) — per order j: [c_x, c_y, c_z, c_xy, c_xz, c_yz,
    c_xyz] applied to elementwise powers."""
    sx, sy, sz = sig0, sig1, sig2
    # sigX = (x*y, x*z, y*z), sigX.w = x*y*z
    xy, xz, yz = sx * sy, sx * sz, sy * sz
    xyz = xy * sz
    s = const
    c = coeffs[0]
    s = s + c[0] * sx + c[1] * sy + c[2] * sz
    s = s + c[3] * xy + c[4] * xz + c[5] * yz + c[6] * xyz
    if order >= 2:
        c = coeffs[1]
        s = s + c[0] * sx**2 + c[1] * sy**2 + c[2] * sz**2
        s = s + c[3] * xy**2 + c[4] * xz**2 + c[5] * yz**2 + c[6] * xyz**2
    if order >= 3:
        c = coeffs[2]
        s = s + c[0] * sx**3 + c[1] * sy**3 + c[2] * sz**3
        s = s + c[3] * xy**3 + c[4] * xz**3 + c[5] * yz**3 + c[6] * xyz**3
    return s


def dovi_reshape(img, dovi: Optional[DoviMetadata]):
    """Apply DV reshaping to (..., 3, H, W) BL signal values in [0,1]."""
    if dovi is None or not dovi.comp:
        return img
    sig = jnp.clip(img, 0.0, 1.0)
    s0 = sig[..., 0, :, :]
    s1 = sig[..., 1, :, :]
    s2 = sig[..., 2, :, :]
    sigs = (s0, s1, s2)

    out = []
    for c in range(3):
        comp = dovi.comp[c]
        s = sigs[c]
        num_pivots = int(comp["num_pivots"]) if isinstance(comp, dict) \
            else comp.num_pivots
        get = (lambda k, comp=comp: comp[k]) if isinstance(comp, dict) \
            else (lambda k, comp=comp: getattr(comp, k))
        if num_pivots < 2:
            out.append(s)
            continue
        pivots = np.asarray(get("pivots")[:num_pivots], np.float32)
        methods = get("method")
        res = None
        for i in range(num_pivots - 1):
            if methods[i] == 0:
                p = np.asarray(get("poly_coeffs")[i], np.float32)
                seg = p[0] + s * (p[1] + s * p[2])
            else:
                order = int(get("mmr_order")[i])
                const = float(get("mmr_constant")[i])
                coeffs = np.asarray(get("mmr_coeffs")[i], np.float32)
                seg = _mmr_eval(s0, s1, s2, const, coeffs, order)
            if i == 0:
                res = seg
            else:
                res = jnp.where(s >= float(pivots[i]), seg, res)
        res = jnp.clip(res, float(pivots[0]), float(pivots[-1]))
        out.append(res)
    return jnp.stack(out, axis=-3)
