"""Polar (EWA) resampling.

TPU-native rebuild of pl_shader_sample_polar (src/shaders/sampling.c:587).
The reference runs a compute shader that cooperatively loads a tile+halo
into shared memory and evaluates a radial weight LUT per (pixel, tap).

TPU-first design: for the overwhelmingly common case of *rational* scale
factors (1080p->4K is exactly 2:1), output pixels fall into a small number
of subpixel phases per axis.  All tap weights then depend only on
(phase_y, phase_x, tap) and are precomputed on the host in float64; the
device computation becomes a static sum of strided-slice * scalar FMAs —
no gathers, no per-pixel weight math, fully fusable by XLA and trivially
vectorizable on the VPU (and batchable into MXU matmuls later).  Output
pixels of phase (py, px) read source pixels on a regular stride, so each
term is `img[y0+ty :: sy, x0+tx :: sx] * w` — a pure dense slice.

Irrational scales fall back to a gather-based path with the radial weight
evaluated through a 256-entry LUT (SCALER_LUT_SIZE, sampling.c:566) via
jnp.interp, matching the reference's LUT resolution.

Anti-ringing follows the reference exactly (sampling.c:524-554): taps
inside the main lobe accumulate ^32-sharpened soft min/max, and the
result is clamped with the configured strength.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import filters as flt
from ..core.common import RectF

__all__ = ["sample_polar", "plan_polar", "phase_geometry",
           "interleave_phases", "to_phase_blocks"]

SCALER_LUT_SIZE = 256
SCALER_LUT_CUTOFF = 1e-3
_MAX_PHASES = 16


@dataclass(frozen=True)
class _AxisPlan:
    base: np.ndarray       # (dst,) int64: leftmost tap source index
    frac: np.ndarray       # (dst,) float64: src position - (base + 0.5)
    period: int            # 0 if aperiodic, else phase count
    stride: int            # source step per period (valid if periodic)


def _plan_axis(src_size: int, dst_size: int, s0: float, s1: float,
               taps: int) -> _AxisPlan:
    scale = (s1 - s0) / dst_size
    o = np.arange(dst_size, dtype=np.float64)
    pos = s0 + (o + 0.5) * scale          # src coordinate of output center
    center = pos - 0.5                    # pixel-index space
    base = np.floor(center).astype(np.int64) - (taps // 2 - 1)
    frac = center - np.floor(center)

    period, stride = 0, 0
    for P in range(1, min(_MAX_PHASES, dst_size) + 1):
        d_base = base[P:] - base[:-P]
        d_frac = frac[P:] - frac[:-P]
        if len(d_base) == 0:
            period, stride = dst_size, 0
            break
        if np.all(np.abs(d_frac) < 1e-9) and np.all(d_base == d_base[0]):
            period, stride = P, int(d_base[0])
            break
    return _AxisPlan(base, frac, period, stride)


def _radial_weight(cfg: flt.FilterConfig, r):
    """Evaluate the (host) radial kernel at distances r (numpy)."""
    return flt.sample_filter(cfg, np.asarray(r))


def plan_polar(cfg: flt.FilterConfig, src_h: int, src_w: int,
               dst_h: int, dst_w: int, rect: RectF):
    """Host-side plan: tap geometry + (if periodic) phase weight tables."""
    sy = (rect.y1 - rect.y0) / dst_h
    sx = (rect.x1 - rect.x0) / dst_w
    f = max(1.0, sy, sx)                  # isotropic kernel widening
    radius, radius_zero = flt.filter_cutoffs(cfg, SCALER_LUT_CUTOFF)
    rad_eff = radius * f
    taps = 2 * int(math.ceil(rad_eff))

    py = _plan_axis(src_h, dst_h, rect.y0, rect.y1, taps)
    px = _plan_axis(src_w, dst_w, rect.x0, rect.x1, taps)
    return dict(f=f, radius=radius, radius_zero=radius_zero, taps=taps,
                plan_y=py, plan_x=px)


def phase_geometry(cfg: flt.FilterConfig, src_h: int, src_w: int,
                   dst_h: int, dst_w: int,
                   rect: Optional[RectF] = None):
    """(Py, Px) phase counts if the fast phased path applies, else None.
    The renderer uses this to decide whether the downstream pointwise
    tail can run in phase-block layout (layout="blocks" below)."""
    r = rect or RectF(0, 0, src_w, src_h)
    plan = plan_polar(cfg, src_h, src_w, dst_h, dst_w, r)
    py, px = plan["plan_y"], plan["plan_x"]
    if (py.period and px.period and py.period <= _MAX_PHASES
            and px.period <= _MAX_PHASES
            and dst_h % py.period == 0 and dst_w % px.period == 0):
        return py.period, px.period
    return None


def to_phase_blocks(img, Py: int, Px: int):
    """(..., H, W) -> phase-block layout (..., Py*Px*Hp, Wp) where block
    (phy, phx) holds img[..., phy::Py, phx::Px] at rows
    [(phy*Px+phx)*Hp, ...). Host-side numpy or traced jnp both work."""
    H, W = img.shape[-2], img.shape[-1]
    Hp, Wp = H // Py, W // Px
    mod = jnp if isinstance(img, jnp.ndarray) else np
    x = img.reshape(*img.shape[:-2], Hp, Py, Wp, Px)
    x = mod.moveaxis(x, (-3, -1), (-4, -3))     # (..., Py, Px, Hp, Wp)
    return x.reshape(*img.shape[:-2], Py * Px * Hp, Wp)


def interleave_phases(img, Py: int, Px: int, dst_h: int, dst_w: int):
    """Inverse of to_phase_blocks: (..., Py*Px*Hp, Wp) -> (..., H, W).
    The ONE retiling of the phased tail.  Expressed as static slices +
    stack/reshape (NOT a 5D transpose: XLA lowers that to a generic
    shuffle that measured 10x slower than this concat form)."""
    Hp, Wp = dst_h // Py, dst_w // Px
    rows = []
    for py in range(Py):
        blocks = [img[..., (py * Px + px) * Hp:(py * Px + px + 1) * Hp, :]
                  for px in range(Px)]
        r = jnp.stack(blocks, axis=-1)          # (..., Hp, Wp, Px)
        rows.append(r.reshape(*r.shape[:-3], Hp, Wp * Px))
    out = jnp.stack(rows, axis=-2)              # (..., Hp, Py, W)
    return out.reshape(*out.shape[:-3], dst_h, dst_w)


def sample_polar(img, cfg: flt.FilterConfig, dst_h: int, dst_w: int,
                 rect: Optional[RectF] = None, antiring: float = 0.0,
                 layout: str = "interleaved"):
    """EWA-resample (..., H, W) -> (..., dst_h, dst_w).

    layout="blocks" (only valid when phase_geometry(...) is not None)
    returns the phase-block layout of to_phase_blocks instead of the
    interleaved image: the phases stay separate (..., Py*Px*Hp, Wp)
    buffers, skipping the stack+reshape retiling copies (~1 ms each at
    4K); the caller runs its pointwise tail in that layout and calls
    interleave_phases once at the very end."""
    src_h, src_w = img.shape[-2], img.shape[-1]
    r = rect or RectF(0, 0, src_w, src_h)
    plan = plan_polar(cfg, src_h, src_w, dst_h, dst_w, r)
    py, px = plan["plan_y"], plan["plan_x"]

    if (py.period and px.period and py.period <= _MAX_PHASES
            and px.period <= _MAX_PHASES
            and dst_h % py.period == 0 and dst_w % px.period == 0):
        # Pure upscales with few phases skip the phase layout entirely:
        # the direct form computes per-phase accumulations at OUTPUT
        # resolution and combines them through rank-1 parity masks, so
        # the result comes out interleaved with NO retiling (the
        # stack+reshape interleave costs ~1 ms at 4K).  It spends
        # Py*Px more VPU FLOPs than the phased form but measures
        # FASTER (3.91 vs 4.83 ms at 1080p->4K): the pipeline is
        # HBM-pass-bound, not FLOP-bound.  Falls back to the phased
        # path for block layouts, anti-ringing and many-phase scales.
        import os as _os
        if (layout == "interleaved" and antiring == 0.0
                and py.stride == 1 and px.stride == 1
                and py.period * px.period <= 4
                and _os.environ.get("LPTPU_DIRECT_EWA", "1") != "0"):
            return _polar_direct(img, cfg, dst_h, dst_w, plan)
        return _polar_phased(img, cfg, dst_h, dst_w, plan, antiring,
                             layout=layout)
    if layout != "interleaved":
        raise ValueError("phase-block layout requires the phased path")
    return _polar_gather(img, cfg, dst_h, dst_w, plan, antiring)


# ---------------------------------------------------------------------------
# Fast path: phase-sliced strided-slice FMA sum
# ---------------------------------------------------------------------------

def _soft_extrema_accumulate(vals_ws):
    """Reference AR accumulation (sampling.c:539-554): given a list of
    (value, weight[, mask]) taps inside the main lobe, compute the
    sharpened soft (min, max). vals are (..., h, w) arrays; weights
    scalars or arrays; the optional mask zeroes a tap's contribution
    per pixel (the gather path's per-pixel lobe test).

    The reference's `(cc + 0.10)^32` softmax base is only meaningful
    for [0,1]-range texels (its GLSL applies the texture-normalization
    `$scale` first, sampling.c:542); the renderer feeds NORM-scaled
    linear light (up to ~49 for PQ), where 49.1^32 overflows f32 to
    inf (inf/inf = NaN), and the LO side's `1 - v` reaches -48, whose
    EVEN power makes the supposedly-losing tap dominate — whole frames
    NaN-poisoned (found by tools/option_sweep_parity.py on
    ewa_lanczos4sharpest, whose built-in cfg.antiring makes AR
    default-on).  Fix: evaluate the softmax in a per-pixel scaled
    space u = v / max(1, vmax, 1-vmin) — the divisor is exactly 1.0
    for in-range content, so the reference formula is reproduced
    bit-for-bit there — with bases clamped at 0 (a tap more than 0.1
    below the scaled range contributes nothing instead of an
    overflowing even power), and un-scale the resulting extrema."""
    import jax.numpy as jnp
    norm = []
    vmax = vmin = None
    for item in vals_ws:
        v, w, m = item if len(item) == 3 else (item[0], item[1], None)
        hiv = v if m is None else jnp.where(m, v, -3e38)
        lov = v if m is None else jnp.where(m, v, 3e38)
        vmax = hiv if vmax is None else jnp.maximum(vmax, hiv)
        vmin = lov if vmin is None else jnp.minimum(vmin, lov)
        norm.append((v, w, m))
    scale = jnp.maximum(jnp.maximum(vmax, 1.0 - vmin), 1.0)
    inv = 1.0 / scale
    ar_lo = ar_hi = ww_lo = ww_hi = None
    for v, w, m in norm:
        u = v * inv
        cc_hi = u
        cc_lo = 1.0 - u
        s_lo = jnp.maximum(cc_lo + 0.10, 0.0)
        s_hi = jnp.maximum(cc_hi + 0.10, 0.0)
        for _ in range(5):
            s_lo = s_lo * s_lo
            s_hi = s_hi * s_hi
        if m is None:
            s_lo = w * s_lo
            s_hi = w * s_hi
        else:
            s_lo = jnp.where(m, w * s_lo, 0.0)
            s_hi = jnp.where(m, w * s_hi, 0.0)
        t_lo = s_lo * cc_lo
        t_hi = s_hi * cc_hi
        if ar_lo is None:
            ar_lo, ar_hi, ww_lo, ww_hi = t_lo, t_hi, s_lo, s_hi
        else:
            ar_lo = ar_lo + t_lo
            ar_hi = ar_hi + t_hi
            ww_lo = ww_lo + s_lo
            ww_hi = ww_hi + s_hi
    # The softmax weights are legitimately TINY on dark content
    # ((0.1)^32 ~ 1e-32, still normal f32), so an absolute epsilon
    # guard like max(ww, 1e-12) silently corrupts the ratio there
    # (soft_min snapped to ~1.0, inverting the extrema).  ww == 0
    # exactly only when every tap is masked out (gather-path pixels
    # with no in-lobe taps) — there AR has no information, so the
    # bounds open up to +-inf and _apply_ar becomes a no-op.
    has_lo = ww_lo > 0
    has_hi = ww_hi > 0
    soft_min = jnp.where(
        has_lo,
        (1.0 - ar_lo / jnp.where(has_lo, ww_lo, 1.0)) * scale, -3e38)
    soft_max = jnp.where(
        has_hi, (ar_hi / jnp.where(has_hi, ww_hi, 1.0)) * scale, 3e38)
    return soft_min, soft_max


def _polar_direct(img, cfg, dst_h, dst_w, plan):
    """Direct interleaved EWA for pure upscales (stride-1 axes): the
    source is nearest-upsampled to the output grid (jnp.repeat — fused
    by XLA, never materialized alone), each phase pair accumulates its
    taps as contiguous full-resolution slices, and rank-1 parity masks
    (indicator row x column vectors) select each phase's pixels.  The
    output is interleaved BY CONSTRUCTION — no stack+reshape retiling.
    Bit-exact vs the phased path (same weights, same edge clamp)."""
    py, px = plan["plan_y"], plan["plan_x"]
    taps, f = plan["taps"], plan["f"]
    radius = plan["radius"]
    Py, Px = py.period, px.period
    src_h, src_w = img.shape[-2], img.shape[-1]

    pad_lo_y = max(0, -int(py.base.min()))
    pad_hi_y = max(0, int(py.base.max()) + taps - src_h)
    pad_lo_x = max(0, -int(px.base.min()))
    pad_hi_x = max(0, int(px.base.max()) + taps - src_w)
    imgp = jnp.pad(img, [(0, 0)] * (img.ndim - 2) +
                   [(pad_lo_y, pad_hi_y), (pad_lo_x, pad_hi_x)],
                   mode="edge")
    rep = jnp.repeat(jnp.repeat(imgp, Py, axis=-2), Px, axis=-1)

    rowm = []
    for p in range(Py):
        m = np.zeros((dst_h, 1), np.float32)
        m[p::Py] = 1.0
        rowm.append(m)
    colm = []
    for p in range(Px):
        m = np.zeros((1, dst_w), np.float32)
        m[0, p::Px] = 1.0
        colm.append(m)

    c0 = taps // 2 - 1
    out = None
    for phy in range(Py):
        y0 = int(py.base[phy]) + pad_lo_y
        for phx in range(Px):
            x0 = int(px.base[phx]) + pad_lo_x
            dy = (np.arange(taps) - c0 - py.frac[phy]) / f
            dx = (np.arange(taps) - c0 - px.frac[phx]) / f
            d = np.sqrt(dy[:, None] ** 2 + dx[None, :] ** 2)
            w = _radial_weight(cfg, d)
            w = np.where(d <= radius, w, 0.0)
            w = (w / w.sum()).astype(np.float32)
            acc = None
            for ty in range(taps):
                for tx in range(taps):
                    wv = float(w[ty, tx])
                    if wv == 0.0:
                        continue
                    # rep[..., j, k] = imgp[j // Py, k // Px]; at output
                    # rows j = phy (mod Py) the tap reads source row
                    # y0 + ty + j // Py = rep row j + Py*(y0 + ty)
                    oy = Py * (y0 + ty)
                    ox = Px * (x0 + tx)
                    sl = rep[..., oy:oy + dst_h, ox:ox + dst_w]
                    acc = sl * wv if acc is None else acc + sl * wv
            m = jnp.asarray(rowm[phy] * colm[phx])
            term = acc * m
            out = term if out is None else out + term
    return out


def _apply_ar(color, soft_min, soft_max, strength):
    clamped = jnp.clip(color, soft_min, soft_max)
    avg = 0.5 * (soft_min + soft_max)
    clamped = jnp.where(soft_min > soft_max, avg, clamped)
    return color + (clamped - color) * strength


def _polar_phased(img, cfg, dst_h, dst_w, plan, antiring,
                  layout: str = "interleaved"):
    py, px = plan["plan_y"], plan["plan_x"]
    taps, f = plan["taps"], plan["f"]
    radius, radius_zero = plan["radius"], plan["radius_zero"]
    Py, Px = py.period, px.period
    Hp, Wp = dst_h // Py, dst_w // Px
    src_h, src_w = img.shape[-2], img.shape[-1]

    # pad source so all strided slices are in-bounds (edge clamp)
    pad_lo_y = max(0, -int(py.base.min()))
    pad_hi_y = max(0, int(py.base.max()) + taps - src_h)
    pad_lo_x = max(0, -int(px.base.min()))
    pad_hi_x = max(0, int(px.base.max()) + taps - src_w)
    pad_width = [(0, 0)] * (img.ndim - 2) + \
        [(pad_lo_y, pad_hi_y), (pad_lo_x, pad_hi_x)]
    imgp = jnp.pad(img, pad_width, mode="edge")

    # NB a Pallas VMEM-tiled variant (DMA tile+halo once, taps as
    # shifted VMEM reads — the reference's shmem pattern) was measured
    # at 31 ms vs this XLA formulation's 3.7 ms at 1080p->4K: the
    # misaligned lane-offset slices each cost cross-lane rotates and the
    # per-tile DMA serializes against compute. Kept out; see round-2
    # notes.

    out_phases = []
    for phy in range(Py):
        row_phases = []
        fy = py.frac[phy]
        y0 = int(py.base[phy]) + pad_lo_y
        for phx in range(Px):
            fx = px.frac[phx]
            x0 = int(px.base[phx]) + pad_lo_x
            # host weights for this phase
            ty = np.arange(taps)
            tx = np.arange(taps)
            c0 = taps // 2 - 1
            dy = (ty - c0 - fy) / f
            dx = (tx - c0 - fx) / f
            d = np.sqrt(dy[:, None] ** 2 + dx[None, :] ** 2)
            w = _radial_weight(cfg, d)
            w = np.where(d <= radius, w, 0.0)
            wsum = w.sum()
            w = (w / wsum).astype(np.float32)

            acc = None
            ar_taps = []
            for iy in range(taps):
                for ix in range(taps):
                    wv = float(w[iy, ix])
                    if wv == 0.0:
                        continue
                    sl = imgp[..., y0 + iy: y0 + iy + (Hp - 1) * py.stride + 1: max(py.stride, 1),
                              x0 + ix: x0 + ix + (Wp - 1) * px.stride + 1: max(px.stride, 1)]
                    term = sl * wv
                    acc = term if acc is None else acc + term
                    if antiring > 0 and d[iy, ix] <= radius_zero:
                        ar_taps.append((sl, wv))
            if antiring > 0 and ar_taps:
                lo, hi = _soft_extrema_accumulate(ar_taps)
                acc = _apply_ar(acc, lo, hi, antiring)
            row_phases.append(acc)
        out_phases.append(row_phases)

    if layout == "blocks":
        # (..., Py*Px*Hp, Wp): concat along the sublane dim — no lane
        # retiling, and XLA emits the phase computations straight into
        # the concat buffer
        return jnp.concatenate(
            [out_phases[phy][phx] for phy in range(Py)
             for phx in range(Px)], axis=-2)

    # interleave phases: out[phy::Py, phx::Px] = out_phases[phy][phx]
    rows = []
    for phy in range(Py):
        r = jnp.stack(out_phases[phy], axis=-1)        # (..., Hp, Wp, Px)
        r = r.reshape(*r.shape[:-3], Hp, Wp * Px)
        rows.append(r)
    out = jnp.stack(rows, axis=-2)                     # (..., Hp, Py, W)
    return out.reshape(*out.shape[:-3], dst_h, dst_w)


# ---------------------------------------------------------------------------
# Fallback: gather path with device-side LUT weights
# ---------------------------------------------------------------------------

def _polar_gather(img, cfg, dst_h, dst_w, plan, antiring):
    py, px = plan["plan_y"], plan["plan_x"]
    taps, f = plan["taps"], plan["f"]
    radius, radius_zero = plan["radius"], plan["radius_zero"]
    src_h, src_w = img.shape[-2], img.shape[-1]

    # radial LUT (256 entries over [0, radius]) like the reference
    rr = np.linspace(0.0, radius, SCALER_LUT_SIZE)
    lut = _radial_weight(cfg, rr).astype(np.float32)
    lut_j = jnp.asarray(lut)

    c0 = taps // 2 - 1
    base_y = jnp.asarray(np.clip(py.base, 0, src_h - 1).astype(np.int32))
    base_x = jnp.asarray(np.clip(px.base, 0, src_w - 1).astype(np.int32))
    idx_y = np.clip(py.base[:, None] + np.arange(taps)[None, :],
                    0, src_h - 1).astype(np.int32)      # (dst_h, taps)
    idx_x = np.clip(px.base[:, None] + np.arange(taps)[None, :],
                    0, src_w - 1).astype(np.int32)
    dy = ((np.arange(taps)[None, :] - c0 - py.frac[:, None]) / f)  # (dst_h,T)
    dx = ((np.arange(taps)[None, :] - c0 - px.frac[:, None]) / f)

    dy2 = jnp.asarray((dy * dy).astype(np.float32))
    dx2 = jnp.asarray((dx * dx).astype(np.float32))
    idx_y_j = jnp.asarray(idx_y)
    idx_x_j = jnp.asarray(idx_x)

    acc = None
    wsum = None
    ar_taps = []
    for iy in range(taps):
        rows = jnp.take(img, idx_y_j[:, iy], axis=-2)   # (..., dst_h, W)
        for ix in range(taps):
            vals = jnp.take(rows, idx_x_j[:, ix], axis=-1)
            d = jnp.sqrt(dy2[:, iy][:, None] + dx2[:, ix][None, :])
            w = jnp.interp(d, jnp.asarray(
                np.linspace(0.0, radius, SCALER_LUT_SIZE, dtype=np.float32)),
                lut_j)
            w = jnp.where(d <= radius, w, 0.0)
            term = vals * w
            acc = term if acc is None else acc + term
            wsum = w if wsum is None else wsum + w
            if antiring > 0:
                # per-pixel main-lobe mask (d varies with the output
                # phase here, unlike the phased path's static taps)
                ar_taps.append((vals, w, d <= radius_zero))

    out = acc / wsum
    if antiring > 0 and ar_taps:
        soft_min, soft_max = _soft_extrema_accumulate(ar_taps)
        out = _apply_ar(out, soft_min, soft_max, antiring)
    return out
