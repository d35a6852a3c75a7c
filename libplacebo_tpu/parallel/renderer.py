"""Multi-chip execution of the FULL render pipeline.

The round-1 `sharded_render_step` (spatial.py) shards a simplified
pipeline; this module shards the *real* one: the same YUV plane merge,
color decode, linearization, main scaler (separable AND polar EWA),
HDR peak detection, tone map, gamut map, delinearize/encode and dither
that `render.renderer.Renderer` traces single-chip — with identical
arithmetic, so the sharded output matches `Renderer.render` (reference
analog: demos/multigpu-bench.c is host-mediated whole-frame hand-off;
here one frame's rows live distributed over ICI, SURVEY.md §5.8).

How exact reuse works
---------------------
Every op in the single-chip pipeline falls in one of three classes:

1. *Pointwise* (decode/linearize/tone/gamut/encode/dither-quantize):
   runs on the local row block unchanged.
2. *Row-resampling* (chroma merge upsample, main scaler): the op's host
   "plan" (tap indices + weights) depends only on the **fractional**
   source positions.  Each shard runs the op on a halo-extended local
   block with the source rect shifted by an **integer** row count, which
   leaves every fractional position — and hence every planned weight —
   identical to the single-chip plan; the taps read the same source
   rows through the exchanged halo (`lax.ppermute`, edge shards
   replicate the frame border exactly like the single-chip edge clamp).
   No sibling implementation: the very same `ops.sampling` /
   `ops.polar` functions execute inside `shard_map`.
3. *Frame-global reductions* (HDR peak histogram/averages): finished
   with `psum`/`pmax` collectives inside `ops.peak_detect.detect_peak`
   (its `axis_name` parameter) — the ICI equivalent of the reference's
   global atomics into one SSBO (shaders/colorspace.c:1155-1313).

Mesh layout: frames batch over 'data', rows of each frame over
'spatial'.  Peak-detect state is per frame: (B, 2).

Supported subset (asserted at build time): the flagship path — planar
or packed input, chroma merge, linear/sigmoid scaling, separable or
polar scalers with anti-ringing, peak detect, any tone/gamut mapping,
dither.  Not yet sharded: rotation, overlays, hooks, custom LUTs, ICC
targets, deband, film grain, error diffusion, contrast recovery (these
need either global layout or neighborhood plans of their own).
"""
from __future__ import annotations

import math
import warnings
from dataclasses import replace
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import filters as flt
from ..core.colorspace import ColorRepr, ColorSpace, ColorTransfer
from ..core.common import RectF
from ..ops import color as ops_color
from ..ops import dithering as ops_dither
from ..ops import peak_detect as ops_peak
from ..ops import polar as ops_polar
from ..ops import sampling as ops_sampling
from ..ops.color import SigmoidParams
from ..render.renderer import (RenderParams, RenderError, Target,
                               color_map_stage, _find_scaler)

__all__ = ["build_sharded_pipeline", "shard_planes", "sharded_state_init",
           "extend_rows"]


# ---------------------------------------------------------------------------
# Halo exchange
# ---------------------------------------------------------------------------

def extend_rows(x, halo: int, n: int, axis_name: str = "spatial"):
    """Extend the row-sharded (..., Hl, W) local block by `halo` rows on
    each side: interior halos come from the ring neighbors over ICI
    (`lax.ppermute`); the first/last shard replicate their border row,
    reproducing the single-chip edge-clamp semantics exactly."""
    if halo <= 0:
        return x
    top_edge = jnp.repeat(x[..., :1, :], halo, axis=-2)
    bot_edge = jnp.repeat(x[..., -1:, :], halo, axis=-2)
    if n == 1:
        return jnp.concatenate([top_edge, x, bot_edge], axis=-2)
    me = jax.lax.axis_index(axis_name)
    # shard i's bottom rows sit directly above shard i+1's block
    from_above = jax.lax.ppermute(
        x[..., -halo:, :], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        x[..., :halo, :], axis_name, [(i, i - 1) for i in range(1, n)])
    from_above = jnp.where(me == 0, top_edge, from_above)
    from_below = jnp.where(me == n - 1, bot_edge, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=-2)


# ---------------------------------------------------------------------------
# Host-side halo planning (from the *global* plans, so interior shards
# never clamp locally where the single-chip plan wouldn't)
# ---------------------------------------------------------------------------

def _halo_ortho(cfg, src_size: int, dst_size: int, s0: float, s1: float,
                n: int) -> int:
    idx, _ = ops_sampling.ortho_weights(cfg, src_size, dst_size, s0, s1)
    src_l, dst_l = src_size // n, dst_size // n
    lo = hi = 1
    for i in range(n):
        sl = idx[i * dst_l:(i + 1) * dst_l]
        lo = max(lo, i * src_l - int(sl.min()))
        hi = max(hi, int(sl.max()) + 1 - (i + 1) * src_l)
    return max(lo, hi)


def _halo_polar(cfg, src_h: int, src_w: int, dst_h: int, dst_w: int,
                rect: RectF, n: int) -> int:
    plan = ops_polar.plan_polar(cfg, src_h, src_w, dst_h, dst_w, rect)
    py, taps = plan["plan_y"], plan["taps"]
    src_l, dst_l = src_h // n, dst_h // n
    lo = hi = 1
    for i in range(n):
        b = py.base[i * dst_l:(i + 1) * dst_l]
        lo = max(lo, i * src_l - int(b.min()))
        hi = max(hi, int(b.max()) + taps - (i + 1) * src_l)
    return max(lo, hi)


# ---------------------------------------------------------------------------
# Builder
# ---------------------------------------------------------------------------

def shard_planes(mesh: Mesh, planes: Sequence):
    """Place per-plane (B, C, ph, pw) arrays: B over 'data', rows over
    'spatial'."""
    sh = NamedSharding(mesh, P("data", None, "spatial", None))
    return tuple(jax.device_put(jnp.asarray(p), sh) for p in planes)


def sharded_state_init(mesh: Mesh, batch: int):
    """Per-frame peak-detect state (B, 2), B over 'data'."""
    sh = NamedSharding(mesh, P("data", None))
    return jax.device_put(jnp.zeros((batch, 2), jnp.float32), sh)


def _check(cond, msg):
    if not cond:
        raise RenderError(f"sharded pipeline: {msg}")


def build_sharded_pipeline(mesh: Mesh, plane_metas,
                           frame_repr: ColorRepr, frame_color: ColorSpace,
                           target: Target,
                           params: Optional[RenderParams] = None,
                           crop: Optional[RectF] = None):
    """Build the jitted multi-chip render step for one frame signature.

    plane_metas: ((shape, component_mapping, shift_x, shift_y), ...) —
    exactly `Frame.meta_key()[0]` with *global* plane shapes (C, ph, pw).

    Returns `step(state, *planes) -> (out, new_state)` where each plane
    is (B, C, ph, pw) sharded (B over 'data', rows over 'spatial'),
    `state` is (B, 2), and `out` is (B, C_out, target.h, target.w) with
    the same sharding.  Per batch element the output equals the
    single-chip `Renderer.render` of that frame.
    """
    from ..render.renderer import DEFAULT_PARAMS, Renderer
    params = params or DEFAULT_PARAMS
    n_sp = int(mesh.shape["spatial"])
    axis = "spatial"

    # ---- unsupported features (see module docstring)
    _check(not params.hooks, "hooks not sharded yet")
    _check(params.lut is None, "custom LUT not sharded yet")
    _check(params.deband is None, "deband not sharded yet")
    _check(params.error_diffusion is None,
           "error diffusion not sharded yet")
    _check(params.contrast_recovery == 0.0,
           "contrast recovery not sharded yet")
    _check(params.deinterlace is None, "deinterlace not sharded yet")
    _check(target.icc is None, "ICC target not sharded yet")
    _check(target.crop is None, "target sub-rect not sharded yet")
    for shape, mapping, sx, sy in plane_metas:
        _check(3 not in mapping, "alpha planes not sharded yet")

    src_color = frame_color.infer()
    dst_color = target.color.infer(target.w, target.h)

    ref_i = Renderer._ref_plane_index(plane_metas)
    H, W = plane_metas[ref_i][0][-2], plane_metas[ref_i][0][-1]
    crop = crop or RectF(0, 0, W, H)
    _check(crop.y0 == 0 and crop.y1 == H,
           "row crop must span the full frame (rows are the sharded axis)")
    dst_h, dst_w = target.h, target.w
    _check(H % n_sp == 0, f"src rows {H} % {n_sp} != 0")
    _check(dst_h % n_sp == 0, f"dst rows {dst_h} % {n_sp} != 0")
    H_l, dst_l = H // n_sp, dst_h // n_sp

    # ---- chroma-merge plans (mirrors Renderer._merge_planes)
    merge_cfg = _find_scaler(params.plane_upscaler)
    merge_plans = []
    for shape, mapping, sx, sy in plane_metas:
        ph, pw = shape[-2], shape[-1]
        if (ph, pw) != (H, W) or sx or sy:
            _check(ph % n_sp == 0, f"plane rows {ph} % {n_sp} != 0")
            s0x = -sx * pw / W
            s0y = -sy * ph / H
            halo_m = _halo_ortho(merge_cfg, ph, H, s0y, s0y + ph, n_sp)
            _check(halo_m <= ph // n_sp,
                   f"merge halo {halo_m} exceeds local rows {ph // n_sp}")
            rect_l = RectF(s0x, s0y + halo_m, s0x + pw, s0y + halo_m +
                           ph // n_sp)
            merge_plans.append((halo_m, rect_l))
        else:
            merge_plans.append(None)

    # ---- main-scaler plan (mirrors pass_scale_main)
    src_h_c = crop.y1 - crop.y0
    src_w_c = crop.x1 - crop.x0
    needs_scale = (abs(src_h_c - dst_h) > 1e-6 or
                   abs(src_w_c - dst_w) > 1e-6 or
                   crop.x0 != 0 or crop.y0 != 0)
    upscaling = dst_w > src_w_c or dst_h > src_h_c
    if needs_scale:
        up = _find_scaler(params.upscaler)
        down = _find_scaler(params.downscaler)
        cfg_s = up if upscaling else down
        if cfg_s.polar:
            halo_s = _halo_polar(cfg_s, H, W, dst_h, dst_w, crop, n_sp)
        else:
            sy_ax = src_h_c / dst_h
            cfg_v = down if (down is not None and sy_ax > 1.0) else cfg_s
            halo_s = _halo_ortho(cfg_v, H, dst_h, crop.y0, crop.y1, n_sp)
        _check(halo_s <= H_l,
               f"scaler halo {halo_s} exceeds local rows {H_l}")
        rect_s = RectF(crop.x0, halo_s, crop.x1, halo_s + H_l)
    else:
        _check(dst_h == H, "pass-through requires matching row counts")
        cfg_s = down = None
        halo_s = 0
        rect_s = None

    use_linear = (params.linear_scaling and needs_scale
                  and not params.disable_linear_scaling)
    use_sigmoid = (use_linear and params.sigmoid is not None
                   and not src_color.is_hdr())
    need_color_map = (src_color.primaries != dst_color.primaries or
                      src_color.transfer != dst_color.transfer)
    use_peak = (params.peak_detect is not None and src_color.is_hdr()
                and need_color_map
                and params.tone_mapping_function in ("spline", "bt2390"))
    if use_peak and dst_l % 16 != 0:
        warnings.warn(
            f"sharded peak detect: local rows {dst_l} not a multiple of "
            "the 16-row stat tile; the frame average uses shard-local "
            "tiles (tiny deviation from single-chip)")

    # ---- dither bias: the frame-global pattern, rows sharded
    bias_np = None
    if target.bit_depth and params.dither is not None:
        dp = replace(params.dither, transfer=dst_color.transfer) \
            if params.dither.transfer == ColorTransfer.UNKNOWN \
            else params.dither
        bias_np = ops_dither._bias_matrix(dp, dst_h, dst_w)
    else:
        dp = None

    def frame_step(state, bias_l, *planes):
        # ---- pass_read_image: merge planes on the local row block
        channels = {}
        for (shape, mapping, sx, sy), plan, data in zip(
                plane_metas, merge_plans, planes):
            if plan is not None:
                halo_m, rect_l = plan
                ext = extend_rows(data, halo_m, n_sp, axis)
                data = ops_sampling.resize_separable(
                    ext, H_l, W, merge_cfg, rect_l)
            for ci, ch in enumerate(mapping):
                channels[ch] = data[..., ci, :, :]
        img = jnp.stack([channels[c] for c in sorted(channels)], axis=-3)
        img = ops_color.decode_color(img, frame_repr, src_color.primaries)

        # ---- pass_scale_main
        if use_linear:
            img = ops_color.linearize(img, src_color)
            if use_sigmoid:
                sig = SigmoidParams(*params.sigmoid)
                img = ops_color.sigmoidize(img, sig)
        if needs_scale:
            ext = extend_rows(img, halo_s, n_sp, axis)
            if cfg_s.polar:
                img = ops_polar.sample_polar(
                    ext, cfg_s, dst_l, dst_w, rect_s,
                    antiring=params.antiringing_strength or cfg_s.antiring)
            else:
                img = ops_sampling.resize_separable(
                    ext, dst_l, dst_w, cfg_s, rect_s, cfg_down=down)
        if use_sigmoid:
            img = ops_color.desigmoidize(img, sig)

        # ---- pass_convert_colors
        new_state = state
        if need_color_map:
            if not use_linear:
                img = ops_color.linearize(img, src_color)
            peak_stats = None
            if use_peak:
                avg_pq, max_pq, new_state = ops_peak.detect_peak(
                    img, state, params.peak_detect, axis_name=axis)
                peak_stats = (avg_pq, max_pq)
            img = color_map_stage(img, src_color, dst_color, params,
                                  peak_stats)
            img = ops_color.delinearize(img, dst_color)
        elif use_linear:
            img = ops_color.delinearize(img, src_color)

        # ---- pass_output_target
        img = ops_color.encode_color(img, target.repr, dst_color.primaries)
        if bias_l is not None:
            img = ops_dither.dither(img, target.bit_depth, dp, bias=bias_l)
        return jnp.clip(img, 0.0, 1.0), new_state

    spec_img = P("data", None, "spatial", None)
    if bias_np is not None:
        def local_step(state_b, bias_l, *planes_b):
            def one(state, *planes):
                return frame_step(state, bias_l, *planes)
            return jax.vmap(one)(state_b, *planes_b)

        in_specs = (P("data", None), P("spatial", None)) + \
            tuple(spec_img for _ in plane_metas)
    else:
        def local_step(state_b, *planes_b):
            def one(state, *planes):
                return frame_step(state, None, *planes)
            return jax.vmap(one)(state_b, *planes_b)

        in_specs = (P("data", None),) + tuple(spec_img for _ in plane_metas)

    step_sharded = shard_map(
        local_step, mesh=mesh, in_specs=in_specs,
        out_specs=(spec_img, P("data", None)), check_vma=False)

    if bias_np is not None:
        bias_j = jnp.asarray(bias_np)

        @jax.jit
        def run(state, *planes):
            return step_sharded(state, bias_j, *planes)
    else:
        @jax.jit
        def run(state, *planes):
            return step_sharded(state, *planes)

    return run
