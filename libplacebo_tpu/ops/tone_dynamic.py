"""Dynamic tone mapping with *traced* scene statistics.

The reference regenerates its tone-mapping LUT on the CPU whenever the
detected peak changes (pl_shader_color_map_ex + pl_tone_map_generate).
On TPU a LUT would be a gather (slow) and host regeneration would force
a device->host sync; instead the two PQ-domain curves used for dynamic
mapping (spline — the default — and bt2390) are evaluated closed-form
with the detected (avg_pq, max_pq) as traced scalars.  One compiled
program handles every scene; zero recompilation, zero sync.

Curve math mirrors core/tone_mapping.py (which mirrors
src/tone_mapping.c) exactly, with host floats replaced by jnp scalars.
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core.colorspace import HdrScaling, hdr_rescale
from ..core.tone_mapping import ToneMapConstants
from ..core.transfer import pow_pos, pq_eotf, pq_oetf

__all__ = ["tone_map_dynamic", "DYNAMIC_TONE_FUNCTIONS"]

# curves evaluable with traced scene statistics (the reference allows
# peak detection with ANY function by regenerating the LUT per frame;
# these four cover every PQ/NITS-domain dynamic operator it ships)
DYNAMIC_TONE_FUNCTIONS = ("spline", "bt2390", "st2094-40", "st2094-10")


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0 + 1e-12), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _pick_knee(src_min, src_max, src_avg, dst_min, dst_max,
               c: ToneMapConstants):
    """Traced st2094_pick_knee (reference tone_mapping.c:227-268); all
    inputs PQ-encoded traced scalars or floats."""
    src_knee_min = src_min + (src_max - src_min) * c.knee_minimum
    src_knee_max = src_min + (src_max - src_min) * c.knee_maximum
    dst_knee_min = dst_min + (dst_max - dst_min) * c.knee_minimum
    dst_knee_max = dst_min + (dst_max - dst_min) * c.knee_maximum

    def_knee = src_min + (src_max - src_min) * c.knee_default
    src_knee = jnp.where(src_avg > 0, src_avg, def_knee)
    src_knee = jnp.clip(src_knee, src_knee_min, src_knee_max)

    target = (src_knee - src_min) / jnp.maximum(src_max - src_min, 1e-6)
    adapted = dst_min + (dst_max - dst_min) * target

    tuning = 1.0 - (_smoothstep(c.knee_maximum, c.knee_default, target) *
                    _smoothstep(c.knee_minimum, c.knee_default, target))
    adaptation = c.knee_adaptation + (1.0 - c.knee_adaptation) * tuning
    dst_knee = src_knee + (adapted - src_knee) * adaptation
    dst_knee = jnp.clip(dst_knee, dst_knee_min, dst_knee_max)
    return src_knee, dst_knee


def tone_map_dynamic(x, function: str,
                     src_max, src_avg,
                     dst_min: float, dst_max: float,
                     src_min: float = 0.0,
                     constants: Optional[ToneMapConstants] = None):
    """Map PQ-encoded values `x` with dynamic source stats.

    x        — traced array, PQ in [0, 1]
    function — "spline" (default op) or "bt2390"
    src_max/src_avg — traced scalars from peak detection (PQ)
    dst_min/dst_max — static display levels (PQ)
    """
    c = (constants or ToneMapConstants()).fixed()
    # constrain input peak >= output peak (params_infer equivalent)
    src_max = jnp.maximum(src_max, dst_max)

    if function == "spline":
        # reference tone_mapping.c:601-664 with traced constants
        src_pivot, dst_pivot = _pick_knee(src_min, src_max, src_avg,
                                          dst_min, dst_max, c)
        slope = (dst_pivot - dst_min) / \
            jnp.maximum(src_pivot - src_min, 1e-6)
        ratio = src_max / dst_max - 1.0
        ratio = jnp.clip(c.slope_tuning * ratio, c.slope_offset,
                         1.0 + c.slope_offset)
        slope = pow_pos(slope, (1.0 - c.spline_contrast) * ratio)

        in_min = src_min - src_pivot
        in_max = src_max - src_pivot
        out_min = dst_min - dst_pivot
        out_max = dst_max - dst_pivot

        Pa = (out_min - slope * in_min) / jnp.maximum(in_min * in_min, 1e-9)
        Pb = slope
        t = 2 * in_max * in_max
        Qa = (slope * in_max - out_max) / jnp.maximum(in_max * t, 1e-9)
        Qb = -3 * (slope * in_max - out_max) / jnp.maximum(t, 1e-9)
        Qc = slope

        xs = jnp.clip(x, src_min, src_max) - src_pivot
        y = jnp.where(xs > 0,
                      ((Qa * xs + Qb) * xs + Qc) * xs,
                      (Pa * xs + Pb) * xs)
        return jnp.clip(y + dst_pivot, dst_min, dst_max)

    if function in ("st2094-40", "st2094-10"):
        # both ST 2094 curves run in their native NITS scaling
        # (reference .scaling = PL_HDR_NITS); stats/pixels convert
        # PQ -> nits on device, the curve applies, and the result
        # converts back — the traced analog of pl_tone_map_generate
        # rebaking the LUT per detected peak
        sm = pq_eotf(src_max) * 10000.0
        smin = hdr_rescale(HdrScaling.PQ, HdrScaling.NITS, src_min)
        dmin = hdr_rescale(HdrScaling.PQ, HdrScaling.NITS, dst_min)
        dmax = hdr_rescale(HdrScaling.PQ, HdrScaling.NITS, dst_max)
        # the knee is picked in PQ space regardless of the curve's
        # native scaling (reference st2094_pick_knee) and converted out
        knee_pq_src, knee_pq_dst = _pick_knee(src_min, src_max, src_avg,
                                              dst_min, dst_max, c)
        src_knee = pq_eotf(knee_pq_src) * 10000.0
        dst_knee = pq_eotf(knee_pq_dst) * 10000.0
        xn = pq_eotf(jnp.clip(x, src_min, src_max)) * 10000.0

        if function == "st2094-10":
            # rational curve through (x1,y1) (knee) (x3,y3)
            # (reference st2094_10, tone_mapping.c:451)
            x1, x2, x3 = smin, src_knee, sm
            y1, y2, y3 = dmin, dst_knee, dmax
            coef1 = x2 * x3 * (y2 - y3) * y1 + x1 * x3 * (y3 - y1) * y2 \
                + x1 * x2 * (y1 - y2) * y3
            coef2 = (x3 * y3 - x2 * y2) * y1 + (x1 * y1 - x3 * y3) * y2 \
                + (x2 * y2 - x1 * y1) * y3
            coef3 = (x3 - x2) * y1 + (x1 - x3) * y2 + (x2 - x1) * y3
            k = 1.0 / (x3 * y3 * (x1 - x2) + x2 * y2 * (x3 - x1) +
                       x1 * y1 * (x2 - x3))
            y = (k * coef1 + k * coef2 * xn) / (1.0 + k * coef3 * xn)
        else:
            # st2094-40 Annex B without HDR10+ OOTF metadata (the
            # detected-peak path; reference tone_mapping.c:409 with
            # T = D, so the D<T / D>T reshaping branches vanish).
            # Bernstein sum with P = [0, P1, 1, ..., 1] collapses to
            # the closed form 1 - B0 - (1-P1)*B1 (Bernstein partition
            # of unity), so the traced curve order N never needs a
            # table lookup.
            def bt1886_oetf(v, lo, hi):
                lb = pow_pos(lo, 1 / 2.4)
                lw = pow_pos(hi, 1 / 2.4)
                return (pow_pos(jnp.maximum(v, 0.0), 1 / 2.4) - lb) / \
                    jnp.maximum(lw - lb, 1e-9)

            def bt1886_eotf(v, lo, hi):
                lb = pow_pos(lo, 1 / 2.4)
                lw = pow_pos(hi, 1 / 2.4)
                return pow_pos((lw - lb) * v + lb, 2.4)

            Kx = jnp.clip(src_knee / jnp.maximum(sm, 1e-9), 1e-6, 1.0)
            Ky = jnp.clip(dst_knee / max(dmax, 1e-9), 0.0, 1.0 - 1e-6)
            slope = Ky / Kx * (1 - Kx) / jnp.maximum(1 - Ky, 1e-9)
            N = jnp.clip(jnp.ceil(slope), 2.0, 16.0)
            P1 = jnp.minimum(slope / N, 1.0)

            xb = bt1886_eotf(bt1886_oetf(xn, smin, sm), 0.0, 1.0)
            t = jnp.clip((xb - Kx) / jnp.maximum(1 - Kx, 1e-9), 0.0, 1.0)
            B0 = pow_pos(jnp.maximum(1 - t, 0.0), N)
            B1 = N * t * pow_pos(jnp.maximum(1 - t, 0.0), N - 1.0)
            bez = 1.0 - B0 - (1.0 - P1) * B1
            bez = Ky + (1 - Ky) * bez
            lin = xb * Ky / Kx
            yb = jnp.where(xb <= Kx, lin, bez)
            y = bt1886_eotf(bt1886_oetf(yb, 0.0, 1.0), dmin, dmax)

        y = pq_oetf(jnp.maximum(y, 0.0) / 10000.0)
        return jnp.clip(y, dst_min, dst_max)

    if function == "bt2390":
        # reference tone_mapping.c:496-538 with traced constants
        rng = jnp.maximum(src_max - src_min, 1e-6)
        minLum = (dst_min - src_min) / rng
        maxLum = (dst_max - src_min) / rng
        offset = c.knee_offset
        ks = (1 + offset) * maxLum - offset
        bp = jnp.where(minLum > 0, jnp.minimum(1.0 / jnp.maximum(minLum, 1e-9), 4.0), 4.0)
        gain_inv = 1 + minLum / jnp.maximum(maxLum, 1e-9) * \
            pow_pos(jnp.maximum(1 - maxLum, 0.0), bp)
        gain = jnp.where(maxLum < 1, 1.0 / gain_inv, 1.0)

        xs = (jnp.clip(x, src_min, src_max) - src_min) / rng
        tb = (xs - ks) / jnp.maximum(1 - ks, 1e-9)
        tb2, tb3 = tb * tb, tb * tb * tb
        pb = ((2 * tb3 - 3 * tb2 + 1) * ks +
              (tb3 - 2 * tb2 + tb) * (1 - ks) +
              (-2 * tb3 + 3 * tb2) * maxLum)
        xs = jnp.where((ks < 1) & (xs >= ks), pb, xs)
        mask = xs < 1
        x_b = xs + minLum * jnp.where(
            mask, pow_pos(jnp.maximum(1 - jnp.minimum(xs, 1.0), 0.0), bp),
            0.0)
        x_b = jnp.where(mask, gain * (x_b - minLum) + minLum, x_b)
        xs = jnp.where(mask, x_b, xs)
        y = xs * rng + src_min
        return jnp.clip(y, dst_min, dst_max)

    raise ValueError(f"dynamic tone mapping unsupported for {function!r}")
