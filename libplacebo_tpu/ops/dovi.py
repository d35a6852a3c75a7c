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


# ---------------------------------------------------------------------------
# Traced-coefficient path: real DV streams carry a new RPU every frame;
# baking coefficients would recompile per frame. Here all coefficients
# enter as a packed pytree of arrays (like the film-grain tables), and
# every segment evaluates both methods with masked selection — one
# compiled program serves the whole stream.
# ---------------------------------------------------------------------------

from typing import NamedTuple

import jax


class DoviPacked(NamedTuple):
    nonlinear: jnp.ndarray   # (3, 3) f32 YCC->RGB matrix (pre-PQ)
    nonlinear_off: jnp.ndarray  # (3,) f32
    linear: jnp.ndarray      # (3, 3) f32 LMS->RGB matrix (post-PQ)
    pivots: jnp.ndarray      # (3, 9) f32, padded with +inf
    nseg: jnp.ndarray        # (3,) i32 number of segments
    method: jnp.ndarray      # (3, 8) i32 (0 poly / 1 mmr)
    poly: jnp.ndarray        # (3, 8, 3) f32
    mmr_const: jnp.ndarray   # (3, 8) f32
    mmr_order: jnp.ndarray   # (3, 8) i32
    mmr: jnp.ndarray         # (3, 8, 3, 7) f32
    lo: jnp.ndarray          # (3,) f32 clamp bounds
    hi: jnp.ndarray          # (3,) f32


def pack_dovi(dovi: DoviMetadata) -> DoviPacked:
    """Host: pack RPU reshape data + matrices into traced arrays."""
    nonlinear = np.asarray(dovi.nonlinear, np.float32).reshape(3, 3) \
        if dovi.nonlinear else np.eye(3, dtype=np.float32)
    nl_off = np.asarray(dovi.nonlinear_offset, np.float32)
    linear = np.asarray(dovi.linear, np.float32).reshape(3, 3) \
        if dovi.linear else np.eye(3, dtype=np.float32)
    pivots = np.full((3, 9), 1e9, np.float32)
    nseg = np.zeros(3, np.int32)
    method = np.zeros((3, 8), np.int32)
    poly = np.zeros((3, 8, 3), np.float32)
    mmr_const = np.zeros((3, 8), np.float32)
    mmr_order = np.ones((3, 8), np.int32)
    mmr = np.zeros((3, 8, 3, 7), np.float32)
    lo = np.zeros(3, np.float32)
    hi = np.ones(3, np.float32)
    for c in range(3):
        comp = dovi.comp[c]
        get = (lambda k, comp=comp: comp[k]) if isinstance(comp, dict) \
            else (lambda k, comp=comp: getattr(comp, k))
        n = int(get("num_pivots"))
        if n < 2:
            nseg[c] = 0
            continue
        nseg[c] = n - 1
        pivots[c, :n] = np.asarray(get("pivots")[:n], np.float32)
        lo[c] = pivots[c, 0]
        hi[c] = pivots[c, n - 1]
        for i in range(n - 1):
            method[c, i] = int(get("method")[i])
            if method[c, i] == 0:
                poly[c, i] = np.asarray(get("poly_coeffs")[i], np.float32)
            else:
                mmr_const[c, i] = float(get("mmr_constant")[i])
                order = int(get("mmr_order")[i])
                mmr_order[c, i] = order
                coeffs = np.asarray(get("mmr_coeffs")[i], np.float32)
                mmr[c, i, :coeffs.shape[0]] = coeffs
    return DoviPacked(*(jnp.asarray(a) for a in
                        (nonlinear, nl_off, linear,
                         pivots, nseg, method, poly, mmr_const, mmr_order,
                         mmr, lo, hi)))


def dovi_reshape_packed(img, packed: DoviPacked):
    """Traced-coefficient DV reshape; structure-independent (8 segments
    always evaluated, masked)."""
    sig = jnp.clip(img, 0.0, 1.0)
    s0 = sig[..., 0, :, :]
    s1 = sig[..., 1, :, :]
    s2 = sig[..., 2, :, :]
    sigs = (s0, s1, s2)

    out = []
    for c in range(3):
        s = sigs[c]
        res = s
        any_seg = packed.nseg[c] > 0
        acc = None
        for i in range(8):
            p = packed.poly[c, i]
            seg_poly = p[0] + s * (p[1] + s * p[2])
            const = packed.mmr_const[c, i]
            coeffs = packed.mmr[c, i]
            seg_mmr = _mmr_eval(s0, s1, s2, const, coeffs, 3)
            # mask higher orders dynamically: recompute order-1/2 partials
            seg_mmr1 = _mmr_eval(s0, s1, s2, const, coeffs, 1)
            seg_mmr2 = _mmr_eval(s0, s1, s2, const, coeffs, 2)
            order = packed.mmr_order[c, i]
            seg_mmr = jnp.where(order >= 3, seg_mmr,
                                jnp.where(order >= 2, seg_mmr2, seg_mmr1))
            seg = jnp.where(packed.method[c, i] == 0, seg_poly, seg_mmr)
            valid = i < packed.nseg[c]
            if acc is None:
                acc = seg
            else:
                take = (s >= packed.pivots[c, i]) & valid
                acc = jnp.where(take, seg, acc)
        res = jnp.clip(acc, packed.lo[c], packed.hi[c])
        out.append(jnp.where(any_seg, res, s))
    return jnp.stack(out, axis=-3)
