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

from ..core.tone_mapping import ToneMapConstants
from ..core.transfer import pow_pos

__all__ = ["tone_map_dynamic"]


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
