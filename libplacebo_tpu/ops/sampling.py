"""Separable (orthogonal) resampling + simple samplers.

TPU-native rebuild of the reference's sampling shaders
(src/shaders/sampling.c): `pl_shader_sample_ortho2` (:950) becomes a
banded weighted gather / banded matmul along one axis; nearest/bilinear
(:277) and oversample (:436) become direct index math.  The polar EWA
path lives in ops/polar.py.

Design notes (TPU-first):
  * Weights are *exact* per output position (computed host-side in
    float64 and cached), not quantized to a 64-phase LUT like the
    reference — same cost on device, strictly better accuracy.
  * Two device strategies per pass:
      - "gather": T static taps, each a row-gather + FMA. O(T·N) work;
        best along the H (sublane) axis.
      - "matmul": dense (dst, src) banded matrix on the MXU. More FLOPs
        but no gathers; best along the W (lane) axis where gathers are
        slow on TPU.
    `resize_separable` picks per-axis defaults; bench.py validates.
  * Downscaling stretches the kernel by the scale ratio, like the
    reference's sample_src_info (src/renderer.c:597-682).
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

__all__ = [
    "ortho_weights", "sample_ortho", "resize_separable", "sample_nearest",
    "sample_bilinear", "sample_oversample",
]


# ---------------------------------------------------------------------------
# Host-side weight planning (cached per signature)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=256)
def _ortho_weights_cached(cfg_key, src_size: int, dst_size: int,
                          s0: float, s1: float):
    cfg = _CFG_REGISTRY[cfg_key]
    return _ortho_weights_impl(cfg, src_size, dst_size, s0, s1)


# FilterConfig isn't hashable-by-identity across calls; registry keyed by
# its value tuple lets lru_cache work.
_CFG_REGISTRY = {}


def ortho_weights(cfg: flt.FilterConfig, src_size: int, dst_size: int,
                  s0: float = 0.0, s1: Optional[float] = None,
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """(idx (dst,T) int32, w (dst,T) float32) mapping src pixels [s0,s1)
    onto dst [0,dst). Rows are energy-normalized; indices edge-clamped."""
    if s1 is None:
        s1 = float(src_size)
    key = cfg.key()
    _CFG_REGISTRY[key] = cfg
    return _ortho_weights_cached(key, src_size, dst_size,
                                 float(s0), float(s1))


def _ortho_weights_impl(cfg, src_size, dst_size, s0, s1):
    scale = (s1 - s0) / dst_size          # src pixels per dst pixel
    f_scale = max(1.0, scale)             # kernel stretch when downscaling
    radius, _ = flt.filter_cutoffs(cfg, 0.0)
    rad_eff = radius * f_scale
    taps = max(2, 2 * int(math.ceil(rad_eff)))

    o = np.arange(dst_size, dtype=np.float64)
    pos = s0 + (o + 0.5) * scale          # absolute src coordinate
    center = pos - 0.5                    # in pixel-index space
    base = np.floor(center).astype(np.int64) - (taps // 2 - 1)
    k = np.arange(taps)
    idx = base[:, None] + k[None, :]      # (dst, taps)
    dist = (center[:, None] - idx) / f_scale
    w = flt.sample_filter(cfg, dist)
    wsum = w.sum(axis=1, keepdims=True)
    # guard: all-zero rows (degenerate configs) fall back to nearest
    bad = np.abs(wsum[:, 0]) < 1e-12
    if bad.any():
        w[bad] = 0.0
        nearest = np.clip(np.round(center[bad]).astype(np.int64) - base[bad],
                          0, taps - 1)
        w[np.nonzero(bad)[0], nearest] = 1.0
        wsum = w.sum(axis=1, keepdims=True)
    w = w / wsum
    idx = np.clip(idx, 0, src_size - 1)
    return idx.astype(np.int32), w.astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side application
# ---------------------------------------------------------------------------

def _ar_mix(out, lo, hi, strength: float):
    """The reference's anti-ringing blend (sampling.c:1099):
    ca = mix(ca, clamp(ca, lo, hi), antiring)."""
    return out + strength * (jnp.clip(out, lo, hi) - out)


def _apply_gather(img, idx: np.ndarray, w: np.ndarray, axis: int,
                  antiring: float = 0.0):
    """Banded weighted sum via T static row-gathers (axis=-2 i.e. H).
    With antiring > 0, the output is clamped toward the [min, max] of
    the two CENTRAL taps (reference sampling.c:1061-1099) — they are
    row-gathers we already pay for, so AR here is a couple of VPU ops."""
    assert axis in (-2, img.ndim - 2), "gather mode expects the H axis"
    taps = idx.shape[1]
    idx_j = jnp.asarray(idx)
    w_j = jnp.asarray(w)
    out = None
    c0 = c1 = None
    for t in range(taps):
        rows = jnp.take(img, idx_j[:, t], axis=-2)       # (..., dst, W)
        if antiring > 0.0:
            if t == taps // 2 - 1:
                c0 = rows
            elif t == taps // 2:
                c1 = rows
        term = rows * w_j[:, t][..., :, None]
        out = term if out is None else out + term
    if antiring > 0.0:
        out = _ar_mix(out, jnp.minimum(c0, c1), jnp.maximum(c0, c1),
                      antiring)
    return out


def _onehot_select(img, sel: np.ndarray, axis: int, src_size: int):
    """Select img[..., sel] along `axis` as a one-hot MXU matmul — the
    repo-wide replacement for lane-axis gathers (CLAUDE.md: a gather
    from the lane dimension is ~O(100x) slower than a matmul here)."""
    dst = sel.shape[0]
    m = np.zeros((dst, src_size), dtype=np.float32)
    m[np.arange(dst), sel] = 1.0
    mj = jnp.asarray(m)
    if axis in (-1, img.ndim - 1):
        return jnp.einsum("...hw,ow->...ho", img, mj, precision="highest")
    return jnp.einsum("...hw,oh->...ow", img, mj, precision="highest")


def _apply_matmul(img, idx: np.ndarray, w: np.ndarray, axis: int,
                  src_size: int, antiring: float = 0.0):
    """Banded weighted sum as a dense (dst, src) matmul on the MXU.
    Anti-ringing fetches the two central taps as one-hot MXU selects
    (min/max are not linear, so they cannot ride the main matmul)."""
    dst = idx.shape[0]
    dense = np.zeros((dst, src_size), dtype=np.float32)
    np.add.at(dense, (np.arange(dst)[:, None], idx), w)
    m = jnp.asarray(dense)
    # float32 accumulation: TPU default matmul precision is bf16, whose
    # ~1e-3 noise would eat most of the 45 dB PSNR budget
    if axis in (-1, img.ndim - 1):
        out = jnp.einsum("...hw,ow->...ho", img, m, precision="highest")
    elif axis in (-2, img.ndim - 2):
        out = jnp.einsum("...hw,oh->...ow", img, m, precision="highest")
    else:
        raise ValueError(axis)
    if antiring > 0.0:
        taps = idx.shape[1]
        c0 = _onehot_select(img, idx[:, taps // 2 - 1], axis, src_size)
        c1 = _onehot_select(img, idx[:, taps // 2], axis, src_size)
        out = _ar_mix(out, jnp.minimum(c0, c1), jnp.maximum(c0, c1),
                      antiring)
    return out


_MAX_ORTHO_PHASES = 8


def _phase_plan(cfg: flt.FilterConfig, src_size: int, dst_size: int,
                s0: float, s1: float):
    """Detect a periodic UNIT-STRIDE tap pattern from the (unclamped)
    plan geometry: returns (period, taps, [(base, weights (T,))]) or
    None.

    When the scale factor is rational with a small denominator (2:1,
    3:1, 3:2...), consecutive outputs of the same phase read source taps
    exactly one texel apart with identical weights — each (phase, tap)
    then becomes a contiguous slice * scalar FMA (the same trick as the
    polar EWA fast path), replacing per-row gathers / dense matmuls."""
    scale = (s1 - s0) / dst_size
    f_scale = max(1.0, scale)
    radius, _ = flt.filter_cutoffs(cfg, 0.0)
    taps = max(2, 2 * int(math.ceil(radius * f_scale)))
    o = np.arange(dst_size, dtype=np.float64)
    center = s0 + (o + 0.5) * scale - 0.5
    base = np.floor(center).astype(np.int64) - (taps // 2 - 1)
    frac = center - np.floor(center)
    for P in range(1, min(_MAX_ORTHO_PHASES, dst_size) + 1):
        if dst_size % P or len(base) <= P:
            continue
        if not (np.all(base[P:] - base[:-P] == 1) and
                np.abs(frac[P:] - frac[:-P]).max() < 1e-9):
            continue
        phases = []
        for p in range(P):
            dist = (center[p] - (base[p] + np.arange(taps))) / f_scale
            w = flt.sample_filter(cfg, dist)
            wsum = w.sum()
            if abs(wsum) < 1e-12:
                return None
            phases.append((int(base[p]), (w / wsum).astype(np.float32)))
        return P, taps, phases
    return None


def _apply_phased(img, axis: int, dst_size: int, src_size: int, plan,
                  antiring: float = 0.0):
    """Phase-sliced unit-stride FMA along `axis` (-1 or -2). Edge
    padding replicates the border, which equals the clamped-index
    semantics of the gather/matmul paths (every out-of-range tap reads
    the border texel either way).  Anti-ringing's two central taps are
    per-phase unit-stride slices we already have — essentially free."""
    P, taps, phases = plan
    n = dst_size // P
    lo = max(0, -min(b for b, _ in phases))
    hi = max(0, max(b for b, _ in phases) + taps - 1 + (n - 1)
             - (src_size - 1))
    last = axis in (-1, img.ndim - 1)
    pad = [(0, 0)] * img.ndim
    pad[-1 if last else -2] = (lo, hi)
    imgp = jnp.pad(img, pad, mode="edge")

    outs = []
    for base, wts in phases:
        b = base + lo
        acc = None
        ar_c = {}
        for t in range(taps):
            need_ar = antiring > 0.0 and t in (taps // 2 - 1, taps // 2)
            wv = float(wts[t])
            if wv == 0.0 and not need_ar:
                continue
            if last:
                sl = imgp[..., b + t: b + t + n]
            else:
                sl = imgp[..., b + t: b + t + n, :]
            if need_ar:
                ar_c[t] = sl
            if wv == 0.0:
                continue
            term = sl * wv
            acc = term if acc is None else acc + term
        if antiring > 0.0:
            c0, c1 = ar_c[taps // 2 - 1], ar_c[taps // 2]
            acc = _ar_mix(acc, jnp.minimum(c0, c1), jnp.maximum(c0, c1),
                          antiring)
        outs.append(acc)
    # interleave phases: out[P*i + p] = outs[p][i]
    if last:
        st = jnp.stack(outs, axis=-1)       # (..., n, P)
        return st.reshape(*st.shape[:-2], n * P)
    st = jnp.stack(outs, axis=-2)           # (..., n, P, W)
    return st.reshape(*st.shape[:-3], n * P, st.shape[-1])


def sample_ortho(img, cfg: flt.FilterConfig, dst_size: int, axis: int,
                 s0: float = 0.0, s1: Optional[float] = None,
                 mode: str = "auto", antiring: float = 0.0):
    """Resample one axis of (..., H, W) images with the given filter
    (reference pl_shader_sample_ortho2, sampling.c:950).

    `antiring` > 0 clamps each output toward the [min, max] of the two
    central taps, mixed by strength (reference sampling.c:1061-1099).
    Like the reference, it applies only when UPSCALING along this axis
    and only for filters with negative lobes (`use_ar &= !use_linear`:
    an all-positive kernel cannot ring)."""
    src_size = img.shape[axis]
    if s1 is None:
        s1 = float(src_size)
    if antiring > 0.0 and not (dst_size > (s1 - s0)):
        antiring = 0.0                  # downscale pass: reference use_ar
    if mode == "auto":
        plan = _phase_plan(cfg, src_size, dst_size, float(s0), float(s1))
        if plan is not None:
            if antiring > 0.0 and not any(
                    w.min() < 0.0 for _, w in plan[2]):
                antiring = 0.0          # no negative lobes: cannot ring
            return _apply_phased(img, axis, dst_size, src_size, plan,
                                 antiring)
        # gathers are cheap along sublanes (H), slow along lanes (W)
        mode = "gather" if axis in (-2, img.ndim - 2) else "matmul"
    idx, w = ortho_weights(cfg, src_size, dst_size, s0, s1)
    if antiring > 0.0 and w.min() >= 0.0:
        antiring = 0.0                  # no negative lobes: cannot ring
    if mode == "gather" and axis in (-1, img.ndim - 1):
        # gather along W: transpose, gather rows, transpose back
        imgT = jnp.swapaxes(img, -1, -2)
        outT = _apply_gather(imgT, idx, w, -2, antiring)
        return jnp.swapaxes(outT, -1, -2)
    if mode == "gather":
        return _apply_gather(img, idx, w, axis, antiring)
    return _apply_matmul(img, idx, w, axis, src_size, antiring)


def resize_separable(img, dst_h: int, dst_w: int, cfg: flt.FilterConfig,
                     rect: Optional[RectF] = None,
                     cfg_down: Optional[flt.FilterConfig] = None,
                     mode: str = "auto", antiring: float = 0.0):
    """Full 2D separable resize of (..., C, H, W) (reference: chained
    ortho2 passes, renderer.c:746-775 — vertical then horizontal; here the
    cheaper axis order is chosen automatically and XLA fuses the chain).

    `rect` crops the source in pixel coordinates (may be fractional).
    `cfg_down` optionally overrides the filter for downscaled axes.
    `antiring` applies the reference's per-pass anti-ringing clamp to
    upscaling passes (sampling.c:1061-1099; sample_ortho gates it).
    """
    src_h, src_w = img.shape[-2], img.shape[-1]
    r = rect or RectF(0, 0, src_w, src_h)

    def cfg_for(axis_scale):
        if cfg_down is not None and axis_scale > 1.0:
            return cfg_down
        return cfg

    sy = (r.y1 - r.y0) / dst_h
    sx = (r.x1 - r.x0) / dst_w
    cy, cx = cfg_for(sy), cfg_for(sx)

    # order: do the pass that shrinks the intermediate most first
    cost_h_first = dst_h * src_w + dst_h * dst_w
    cost_w_first = src_h * dst_w + dst_h * dst_w
    if cost_h_first <= cost_w_first:
        out = sample_ortho(img, cy, dst_h, -2, r.y0, r.y1, mode, antiring)
        out = sample_ortho(out, cx, dst_w, -1, r.x0, r.x1, mode, antiring)
    else:
        out = sample_ortho(img, cx, dst_w, -1, r.x0, r.x1, mode, antiring)
        out = sample_ortho(out, cy, dst_h, -2, r.y0, r.y1, mode, antiring)
    return out


# ---------------------------------------------------------------------------
# Direct samplers (reference sampling.c:277-436)
# ---------------------------------------------------------------------------

def _axis_positions(src_size, dst_size, s0, s1):
    o = np.arange(dst_size, dtype=np.float64)
    scale = (s1 - s0) / dst_size
    return s0 + (o + 0.5) * scale


def sample_nearest(img, dst_h: int, dst_w: int,
                   rect: Optional[RectF] = None):
    """Nearest-neighbor resize (reference PL_TEX_SAMPLE_NEAREST path)."""
    src_h, src_w = img.shape[-2], img.shape[-1]
    r = rect or RectF(0, 0, src_w, src_h)
    ys = np.clip(np.floor(_axis_positions(src_h, dst_h, r.y0, r.y1)),
                 0, src_h - 1).astype(np.int32)
    xs = np.clip(np.floor(_axis_positions(src_w, dst_w, r.x0, r.x1)),
                 0, src_w - 1).astype(np.int32)
    out = jnp.take(img, jnp.asarray(ys), axis=-2)
    return jnp.take(out, jnp.asarray(xs), axis=-1)


def sample_bilinear(img, dst_h: int, dst_w: int,
                    rect: Optional[RectF] = None):
    """Bilinear resize == separable triangle filter."""
    cfg = flt.find_filter_config("bilinear")
    return resize_separable(img, dst_h, dst_w, cfg, rect)


def sample_oversample(img, dst_h: int, dst_w: int,
                      rect: Optional[RectF] = None, threshold: float = 0.0):
    """Aspect-preserving nearest with edge blending (reference
    pl_shader_sample_oversample, sampling.c:436): like nearest, but pixels
    straddling a source-texel boundary are linearly interpolated; with
    `threshold`, near-integer coverage snaps to nearest."""
    src_h, src_w = img.shape[-2], img.shape[-1]
    r = rect or RectF(0, 0, src_w, src_h)

    def coeffs(src_size, dst_size, a0, a1):
        pos = _axis_positions(src_size, dst_size, a0, a1)
        scale = (a1 - a0) / dst_size
        center = pos - 0.5
        lo = np.floor(center).astype(np.int64)
        frac = center - lo
        # fraction of the dst pixel covered by the hi texel
        w_hi = np.clip((frac - 0.5) / max(scale, 1e-9) + 0.5, 0.0, 1.0) \
            if scale < 1 else frac
        if threshold > 0:
            w_hi = np.where(w_hi < threshold, 0.0, w_hi)
            w_hi = np.where(w_hi > 1 - threshold, 1.0, w_hi)
        idx0 = np.clip(lo, 0, src_size - 1)
        idx1 = np.clip(lo + 1, 0, src_size - 1)
        return (idx0.astype(np.int32), idx1.astype(np.int32),
                w_hi.astype(np.float32))

    y0, y1, wy = coeffs(src_h, dst_h, r.y0, r.y1)
    x0, x1, wx = coeffs(src_w, dst_w, r.x0, r.x1)
    wy_j = jnp.asarray(wy)[:, None]
    wx_j = jnp.asarray(wx)[None, :]
    row0 = jnp.take(img, jnp.asarray(y0), axis=-2)
    row1 = jnp.take(img, jnp.asarray(y1), axis=-2)
    rows = row0 * (1 - wy_j) + row1 * wy_j
    col0 = jnp.take(rows, jnp.asarray(x0), axis=-1)
    col1 = jnp.take(rows, jnp.asarray(x1), axis=-1)
    return col0 * (1 - wx_j) + col1 * wx_j
