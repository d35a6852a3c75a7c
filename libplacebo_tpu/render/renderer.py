"""The renderer: frame -> target image pipeline.

TPU-native rebuild of pl_render_image (src/renderer.c:3433).  The
reference dynamically fuses GLSL fragments and dispatches 2-6 GPU passes
per frame; here the whole pipeline is *one* traced JAX function that XLA
fuses, compiled once per (frame-geometry, params) signature and cached —
the cache plays the role of pl_dispatch's pass cache (dispatch.c:893).

Stage order mirrors the reference call stack (SURVEY.md §3.1):
  pass_read_image    -> _merge_planes + decode_color (+deband/grain later)
  pass_scale_main    -> linearize/sigmoidize + main scaler
  pass_convert_colors-> color-space conversion (+tone/gamut map for HDR)
  pass_output_target -> delinearize + encode + dither
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import filters as flt
from ..core import tone_mapping as tm
from ..core.colorspace import (COLOR_SDR_WHITE, ColorLevels, ColorPrimaries,
                               ColorRepr, ColorSpace, ColorSystem,
                               ColorTransfer, HdrScaling,
                               color_mapping_matrix, color_space_infer_map,
                               hdr_rescale, primaries_get, primaries_guess,
                               transfer_is_hdr)
from ..core.common import RectF
from ..ops import color as ops_color
from ..ops import deband as ops_deband
from ..ops import dithering as ops_dither
from ..ops import film_grain as ops_fg
from ..ops import peak_detect as ops_peak
from ..ops import sampling as ops_sampling
from ..ops import tone_dynamic as ops_tone_dyn
from ..ops.color import SigmoidParams
from ..ops.dithering import DitherParams
from ..ops.peak_detect import PeakDetectParams
from .frame import Frame, Plane

__all__ = ["RenderParams", "Target", "Renderer", "render_image",
           "RenderError", "color_map_stage", "tone_with_recovery",
           "ALPHA_OVERLAY"]

# reference pl_alpha_overlay (gpu.h:1163): typical alpha compositing
ALPHA_OVERLAY = ("src_alpha", "one_minus_src_alpha",
                 "one", "one_minus_src_alpha")


class RenderError(Exception):
    pass


# Graceful-degradation ladder (reference enum pl_render_error,
# renderer.c:95-115: on pass failure the renderer sets an error bit and
# silently re-renders without the offending feature).  Ordered from most
# expendable to least; each entry is (flag, strip-fn).
_DEGRADE_LADDER = (
    ("fused_colormap", lambda p: replace(p, disable_fused_colormap=True)),
    ("error_diffusion", lambda p: replace(p, error_diffusion=None)),
    ("contrast_recovery", lambda p: replace(p, contrast_recovery=0.0)),
    ("film_grain", lambda p: replace(p, film_grain=False)),
    ("deband", lambda p: replace(p, deband=None)),
    ("peak_detect", lambda p: replace(p, peak_detect=None)),
    ("gamut_mapping", lambda p: replace(p, gamut_mapping="clip")),
    ("dither", lambda p: replace(p, dither=None)),
    ("sampling", lambda p: replace(p, upscaler="bilinear",
                                   downscaler="bilinear",
                                   linear_scaling=False,
                                   sigmoid=None)),
)


def _strips_anything(flag: str, strip, params) -> bool:
    return strip(params).key() != params.key()


# Exceptions that are USER errors, not backend failures: never degraded
# away (the reference's PL_RENDER_ERR_* recovery covers shader/GPU
# failures only, renderer.c:777-788). ValueError/TypeError cover bad
# shapes/params raised by our own validation and by jnp argument checks.
_NON_DEGRADABLE = (RenderError, ValueError, TypeError, KeyError)

# bound on the compiled-pipeline cache (reference dispatch.c:707 GCs
# passes above max_passes)
_MAX_CACHED_PIPELINES = 64


@dataclass(frozen=True)
class Target:
    """Render target description (reference: the target pl_frame)."""
    w: int
    h: int
    repr: ColorRepr = field(default_factory=lambda: ColorRepr(
        sys=ColorSystem.RGB, levels=ColorLevels.FULL))
    color: ColorSpace = field(default_factory=ColorSpace)
    bit_depth: int = 0           # 0 = no dither/quantization
    crop: Optional[RectF] = None
    # display ICC profile (core.icc.IccProfile); when set, the output is
    # encoded through the profile's gamut matrix + TRCs instead of the
    # standard transfer (reference pl_icc_encode, renderer.c:2271)
    icc: Optional[object] = None
    # existing target contents (C, h, w) for RenderParams.blend — the
    # analog of the reference rendering onto a non-cleared target
    # texture with pl_blend_params; enters the pipeline as a traced
    # argument (per-frame contents never force a re-trace)
    data: Optional[object] = field(default=None, compare=False)
    # target overlays (OSD drawn on the output; reference
    # pl_frame.overlays on the *target* frame) — default coords are
    # DST_FRAME (renderer.c:861)
    overlays: tuple = field(default=(), compare=False)

    def meta_key(self):
        # the whole HdrMetadata is part of the key: inferred min/max_luma
        # (and HDR10+ scene stats) bake into the traced tone curve and
        # gamut boundary fits — omitting them would silently reuse a
        # stale pipeline when only mastering metadata changed
        icc_key = None
        if self.icc is not None:
            icc_key = getattr(self.icc, "signature", 0) or id(self.icc)
        return (self.w, self.h, self.repr.sys, self.repr.levels,
                self.repr.bits, self.color.primaries, self.color.transfer,
                self.color.hdr, self.bit_depth, self.crop, icc_key,
                self.data is not None,
                tuple(o.key() for o in self.overlays))


@dataclass(frozen=True)
class RenderParams:
    """Subset of reference pl_render_params (renderer.h) driving the
    pipeline; grows as features land. Presets mirror the reference's
    fast/default/high_quality bundles."""
    upscaler: str = "lanczos"
    downscaler: str = "hermite"
    # chroma/plane alignment scalers (reference renderer.h:145-152:
    # None = inherit upscaler/downscaler; our default keeps the cheap
    # bilinear merge — set None for reference-default inheritance)
    plane_upscaler: Optional[str] = "bilinear"
    plane_downscaler: Optional[str] = None
    # resample same-size planes whose chroma siting is a pure subpixel
    # offset (reference renderer.h:322 correct_subpixel_offsets; off =
    # the offset snaps to the nearest texel like the reference default)
    correct_subpixel_offsets: bool = False
    frame_mixer: str = "oversample"
    antiringing_strength: float = 0.0
    # scaling in (sigmoidized) linear light
    linear_scaling: bool = True
    sigmoid: Optional[Tuple[float, float]] = (0.75, 6.5)  # (center, slope)
    # features
    dither: Optional[DitherParams] = field(default_factory=DitherParams)
    error_diffusion: Optional[str] = None   # kernel name, overrides dither
    # disable the gamma-correct low-depth dither path (reference
    # pl_render_params.disable_dither_gamma_correction)
    disable_dither_gamma_correction: bool = False
    tone_mapping_function: str = "spline"
    # which HDR metadata tier feeds the (static) tone curve (reference
    # pl_color_map_params.metadata): any|none|hdr10|hdr10plus|cie_y
    tone_map_metadata: str = "any"
    gamut_mapping: str = "perceptual"
    # accepted-for-compat options with no TPU-side effect (reference
    # LUT/FBO machinery knobs: tone_lut_size, lut3d_size_*, polar_cutoff
    # etc. — this pipeline is LUT-free and FBO-free by design); kept so
    # option strings round-trip; sorted (key, value) tuple
    compat_flags: Tuple = ()
    # tunable curve constants (reference pl_color_map_params
    # .tone_constants / .gamut_constants)
    tone_constants: "tm.ToneMapConstants" = field(
        default_factory=lambda: tm.ToneMapConstants())
    gamut_constants: "object" = field(
        default_factory=lambda: __import__(
            "libplacebo_tpu.core.gamut_mapping",
            fromlist=["GamutMapConstants"]).GamutMapConstants())
    peak_detect: Optional[PeakDetectParams] = field(
        default_factory=PeakDetectParams)
    deband: Optional[ops_deband.DebandParams] = None
    film_grain: bool = True      # honor frame-attached grain data
    deinterlace: Optional[object] = None  # ops.deinterlace.DeinterlaceParams
    # HDR contrast recovery strength (reference pl_color_map_params
    # .contrast_recovery; 0 = off) and feature-map downscale ratio
    # (.contrast_smoothness, renderer.c:2112)
    contrast_recovery: float = 0.0
    contrast_smoothness: float = 3.5
    # SDR->HDR inverse tone mapping (reference pl_color_map_params
    # .inverse_tone_mapping): allow the tone curve to EXCEED the source
    # peak when the display is brighter
    inverse_tone_mapping: bool = False
    # allow bidirectional gamut maps to expand into a wider display
    # gamut (reference .gamut_expansion; default clips the output gamut
    # to the source via pl_primaries_clip, colorspace.c:1709)
    gamut_expansion: bool = False
    # debug: highlight pixels outside the representable range (reference
    # .show_clipping, colorspace.c:1805-2010)
    show_clipping: bool = False
    # debug: draw the tone curve / gamut boundary slice into a sub-rect
    # of the output (reference .visualize_lut/_rect/_hue/_theta,
    # colorspace.c:1424-1545)
    visualize_lut: bool = False
    visualize_rect: Tuple[float, float, float, float] = (0.0, 0.0,
                                                         1.0, 1.0)
    visualize_hue: float = 0.0
    visualize_theta: float = 0.0
    # color-blindness simulation/adaptation (reference
    # pl_render_params.cone_params; core.colorspace.ConeParams)
    cone: Optional[object] = None
    # affine distortion applied to the output image (reference
    # pl_render_params.distort_params -> pl_shader_distort,
    # renderer.c:2655; ops.distort.DistortParams)
    distort: Optional[object] = None
    # target blending (reference pl_render_params.blend_params,
    # gpu.h:1153): how the rendered image composites onto existing
    # target contents (Target.data); ops-level factors
    # zero|one|src_alpha|one_minus_src_alpha per rgb/alpha
    blend: Optional[Tuple[str, str, str, str]] = None
    # user color adjustment (reference pl_render_params.color_adjustment;
    # core.colorspace.ColorAdjustment), folded into the decode matrix
    color_adjustment: Optional[object] = None
    # border fill when the image doesn't cover the target (reference
    # pl_render_params.background/border: clear_target renderer.c:2491).
    # border modes: color | tiles | skip (transparent black — no
    # preexisting target contents exist here) | blur (blurred copy of
    # the image stretched to cover, reference PL_CLEAR_BLUR +
    # pass_blur renderer.c:2345)
    background: str = "color"            # color | tiles
    border: Optional[str] = None         # None -> same as background
    background_color: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    background_transparency: float = 0.0
    tile_colors: Tuple = ((0.93, 0.93, 0.93), (0.87, 0.87, 0.87))
    tile_size: int = 32
    blur_radius: float = 16.0            # border="blur" strength (px)
    skip_target_clearing: bool = False   # legacy alias for border="skip"
    # dither even for >=16-bit outputs (reference renderer.c:2888:
    # depth < 16 || force_dither)
    force_dither: bool = False
    # rounded-corner mask strength, 0..1 of min(w,h)/2 (reference
    # pl_render_params.corner_rounding, renderer.c:2615)
    corner_rounding: float = 0.0
    hooks: Tuple = ()            # render.hooks.Hook instances
    lut: Optional[object] = None          # core.lut.CustomLut
    lut_type: str = "conversion"          # native|normalized|conversion
    # ICC handling (reference pl_render_params.ignore_icc_profiles)
    ignore_icc_profiles: bool = False
    # frame-mixing cache control (reference preserve_mixing_cache /
    # skip_caching_single_frame, renderer.h)
    preserve_mixing_cache: bool = False
    skip_caching_single_frame: bool = False
    # disables
    skip_anti_aliasing: bool = False
    disable_linear_scaling: bool = False
    # internal: set by the degradation ladder to force the plain-XLA
    # color-map tail if the fused Pallas epilogue ever fails
    disable_fused_colormap: bool = False

    def key(self):
        return (self.upscaler, self.downscaler, self.plane_upscaler,
                self.plane_downscaler, self.correct_subpixel_offsets,
                self.disable_fused_colormap,
                self.antiringing_strength, self.linear_scaling,
                self.sigmoid, self.dither, self.error_diffusion,
                self.disable_dither_gamma_correction,
                self.tone_mapping_function, self.tone_map_metadata,
                self.gamut_mapping, self.compat_flags,
                self.tone_constants, self.gamut_constants,
                self.corner_rounding,
                self.skip_anti_aliasing,
                self.disable_linear_scaling,
                self.peak_detect.key() if self.peak_detect else None,
                self.deband.key() if self.deband else None,
                self.film_grain,
                self.deinterlace.key() if self.deinterlace else None,
                self.contrast_recovery, self.contrast_smoothness,
                self.inverse_tone_mapping, self.gamut_expansion,
                self.show_clipping, self.visualize_lut,
                self.visualize_rect, self.visualize_hue,
                self.visualize_theta, self.ignore_icc_profiles,
                self.preserve_mixing_cache,
                self.skip_caching_single_frame, self.cone,
                self.distort.key() if self.distort is not None else None,
                self.blend,
                self.color_adjustment, self.background, self.border,
                self.background_color, self.background_transparency,
                self.tile_colors, self.tile_size, self.blur_radius,
                self.skip_target_clearing, self.force_dither,
                tuple(h.signature for h in self.hooks),
                self.lut.signature if self.lut is not None else None,
                self.lut_type)


# preset bundles (reference renderer.c:203-224)
FAST_PARAMS = RenderParams(upscaler="bilinear", downscaler="bilinear",
                           linear_scaling=False, sigmoid=None,
                           dither=DitherParams(
                               method=ops_dither.DitherMethod.ORDERED_FIXED))
DEFAULT_PARAMS = RenderParams()
HIGH_QUALITY_PARAMS = RenderParams(
    upscaler="ewa_lanczossharp", downscaler="hermite",
    deband=ops_deband.DebandParams(),
    peak_detect=PeakDetectParams(percentile=99.995),
    contrast_recovery=0.30)


def _find_scaler(name: str) -> flt.FilterConfig:
    cfg = flt.find_filter_config(name)
    if cfg is None:
        raise RenderError(f"unknown filter: {name}")
    return cfg


def color_map_stage(img, src: ColorSpace, dst: ColorSpace,
                    params: RenderParams, peak_stats=None,
                    tone_recovery_impl=None):
    """Linear-light color conversion: fused tone + gamut mapping through
    ONE IPT round trip (reference pl_shader_color_map_ex, shaders/
    colorspace.c:1790-1980: RGB -> LMS -> PQ -> IPT, tone map on the
    PQ-encoded intensity ipt.x with the cubic-hull chroma adjustment,
    gamut operator on ICh, back out through the *destination* LMS
    matrices — the primaries conversion rides the shared LMS space for
    free).  With `peak_stats`, the tone curve adapts to the detected
    (avg, peak) as traced scalars — the TPU equivalent of the
    reference's per-frame LUT refresh.

    Module-level (not a Renderer method) so the multi-chip sharded
    pipeline (parallel/renderer.py) applies the *identical* stage: it is
    pointwise in the pixels, so it needs no communication."""
    from ..ops import gamut as ops_gamut
    need_gamut = (src.primaries != dst.primaries and
                  params.gamut_mapping not in (None, "", "none"))
    # HDR metadata source selection (reference tone_map_metadata,
    # colorspace.c:1651: the SOURCE stats honor the choice; the
    # destination always uses the static HDR10 tier)
    src_min_n, src_max_n, src_avg_n = src.infer().nominal_luma(
        params.tone_map_metadata)
    src_peak = src_max_n / COLOR_SDR_WHITE
    dst_peak = dst.nominal_peak_norm()
    need_tone = peak_stats is not None or src_peak > dst_peak + 1e-3
    # SDR->HDR expansion (reference inverse_tone_mapping,
    # colorspace.c:1674-1678: output may exceed the source peak only
    # when requested; the curve's map_inverse handles the stretch)
    inverse_tone = (params.inverse_tone_mapping
                    and dst_peak > src_peak + 1e-3
                    and peak_stats is None)
    need_tone = need_tone or inverse_tone

    src_inf = src.infer()
    dst_inf = dst.infer()
    dst_min_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                             dst_inf.hdr.min_luma)
    dst_max_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                             dst_inf.hdr.max_luma)

    # fast paths that skip the IPT round trip entirely (reference
    # colorspace.c:1780-1788)
    if not need_tone:
        if not need_gamut or params.gamut_mapping in ("clip", "saturation"):
            if src.primaries != dst.primaries:
                m = color_mapping_matrix(primaries_get(src.primaries),
                                         primaries_get(dst.primaries))
                img = ops_color.apply_matrix(img, m.m)
            if need_gamut:   # clip/saturation = plain range clamp
                b_dst = ops_gamut.ipt_space(primaries_get(dst.primaries),
                                            dst_min_pq, dst_max_pq)
                to_norm = COLOR_SDR_WHITE / 10000.0
                img = jnp.clip(img, b_dst.min_rgb / to_norm,
                               b_dst.max_rgb / to_norm)
            return img

    if need_gamut and params.gamut_mapping not in ("clip", "saturation"):
        from ..core.colorspace import primaries_clip, primaries_compatible
        dst_prim = primaries_get(dst.primaries)
        src_prim = primaries_get(src.primaries)
        # bidirectional operators (perceptual/saturation) would expand
        # colors into a wider display gamut; unless gamut_expansion is
        # requested, clip the output gamut to the source first
        # (reference colorspace.c:1709 + pl_primaries_clip)
        if (not params.gamut_expansion
                and params.gamut_mapping in ("perceptual",)
                and primaries_compatible(dst_prim, src_prim)):
            dst_prim = primaries_clip(dst_prim, src_prim)
        b_src = ops_gamut.fit_boundary(src_prim, dst_min_pq, dst_max_pq)
        b_dst = ops_gamut.fit_boundary(dst_prim, dst_min_pq, dst_max_pq)
        gamut_fn = params.gamut_mapping
    else:
        b_src = ops_gamut.ipt_space(primaries_get(src.primaries),
                                    dst_min_pq, dst_max_pq)
        b_dst = ops_gamut.ipt_space(primaries_get(dst.primaries),
                                    dst_min_pq, dst_max_pq)
        gamut_fn = "clip" if need_gamut else None

    tone_fn = None
    if need_tone:
        if peak_stats is not None:
            avg_pq, max_pq = peak_stats
            base = lambda x: ops_tone_dyn.tone_map_dynamic(
                x, params.tone_mapping_function,
                src_max=max_pq, src_avg=avg_pq,
                dst_min=dst_min_pq, dst_max=dst_max_pq,
                constants=params.tone_constants)
        else:
            # closed-form tone curve on device (tm.apply_device —
            # elementwise math XLA fuses; a LUT gather would be ~70x
            # slower on TPU)
            fun = tm.find_tone_map_function(params.tone_mapping_function) \
                or tm.TONE_MAP_SPLINE
            p = tm.ToneMapParams(
                function=fun,
                input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
                lut_size=256, constants=params.tone_constants,
                input_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                                      src_min_n),
                input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                                      src_max_n),
                input_avg=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                                      src_avg_n) if src_avg_n else 0.0,
                output_min=dst_min_pq, output_max=dst_max_pq,
                # source HDR metadata so st2094-40 honors the HDR10+
                # OOTF bezier anchors (reference fills
                # pl_tone_map_params.hdr from the image csp)
                hdr=src_inf.hdr)
            base = lambda x: tm.apply_device(x, p)
        cr = params.contrast_recovery
        # tone_recovery_impl: override for the low-pass feature-map
        # resizes (the sharded renderer substitutes a halo-exchanging
        # variant with identical weights, parallel/renderer.py)
        if tone_recovery_impl is not None:
            recov = tone_recovery_impl
            tone_fn = lambda x: recov(x, base, cr, dst_min_pq, dst_max_pq)
        else:
            tone_fn = lambda x: tone_with_recovery(
                x, base, cr, dst_min_pq, dst_max_pq,
                smoothness=params.contrast_smoothness)

    show_bounds = None
    if params.show_clipping:
        show_bounds = (
            hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                        src_inf.hdr.min_luma),
            hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                        src_inf.hdr.max_luma))
    out = ops_gamut.color_map_ipt(img, tone_fn, gamut_fn, b_src, b_dst,
                                  to_norm=COLOR_SDR_WHITE / 10000.0,
                                  constants=params.gamut_constants,
                                  show_clip_bounds=show_bounds)
    if params.visualize_lut and tone_fn is not None:
        # fade the tone curve out as theta turns toward the gamut view,
        # like the reference (colorspace.c:2014-2016)
        alpha = math.cos(params.visualize_theta) ** 5 \
            if gamut_fn not in (None, "clip", "saturation") else 1.0
        out = _visualize_tone_map(
            out, params.visualize_rect, max(alpha, 0.0), tone_fn,
            in_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, src_min_n),
            in_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, src_max_n),
            in_avg=(peak_stats[0] if peak_stats is not None else
                    (hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                                 src_avg_n) if src_avg_n else 0.0)),
            out_min=dst_min_pq, out_max=dst_max_pq)
    return out


def _visualize_tone_map(color, rect, alpha, tone_fn, in_min, in_max,
                        in_avg, out_min, out_max):
    """Exact port of the reference tone-curve visualizer
    (visualize_tone_map, shaders/colorspace.c:1424-1483): draws the
    PQ->PQ transfer curve, source/target ranges, the main diagonal, the
    inverse-tone-mapping region, and the average-brightness marker into
    `rect` (fractions of the frame, y up)."""
    H, W = color.shape[-2], color.shape[-1]
    x0, y0, x1, y1 = rect
    px = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    py = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    pos_x = ((px - x0) / max(x1 - x0, 1e-6))[None, :]
    pos_y = (1.0 - (py - y0) / max(y1 - y0, 1e-6))[:, None]
    in_rect = ((pos_x >= 0) & (pos_x <= 1) & (pos_y >= 0) & (pos_y <= 1))

    vv = tone_fn(jnp.clip(pos_x, 0.0, 1.0))
    a = jnp.asarray(0.8 * alpha, jnp.float32)

    def const_rgb(r, g, b):
        return jnp.stack([jnp.full((H, W), r, jnp.float32),
                          jnp.full((H, W), g, jnp.float32),
                          jnp.full((H, W), b, jnp.float32)], axis=-3)

    viz = color[..., :3, :, :]
    amask = jnp.where(in_rect, a, 0.0)

    inside_src = (pos_x >= in_min) & (pos_x <= in_max)
    inside_dst = (pos_y >= out_min) & (pos_y <= out_max)
    osrc_y = (pos_y < in_min) | (pos_y > in_max)

    # outside target range
    m = inside_src & ~inside_dst
    viz = jnp.where(m & osrc_y, const_rgb(0.1, 0.1, 0.5),
                    jnp.where(m, const_rgb(0.2, 0.05, 0.05), viz))
    # inside domain
    dom = inside_src & inside_dst
    diag = jnp.abs(pos_x - pos_y) < 1e-3
    below = pos_y < vv
    brighter = (vv > pos_x) & (pos_y > pos_x)
    darker = (vv < pos_x) & (pos_y < pos_x)
    body = jnp.where(brighter, const_rgb(0.5, 0.7, 0.05),
                     const_rgb(0.05, 0.05, 0.05))
    outer = jnp.where(darker, const_rgb(0.0, 0.1, 0.2), viz)
    viz = jnp.where(dom & diag, const_rgb(0.2, 0.2, 0.2),
                    jnp.where(dom & below, body,
                              jnp.where(dom, outer, viz)))
    amask = jnp.where(dom & below & ~diag, amask * 0.6, amask)
    # inverse-tone-mapping / black point regions
    itm = dom & (pos_y > in_max)
    viz = jnp.where(itm, viz + (const_rgb(0.2, 0.5, 0.8) - viz) * 0.5,
                    viz)
    blk = dom & (pos_y < in_min)
    viz = jnp.where(blk, viz * 0.7, viz)
    if isinstance(in_avg, (int, float)):
        has_avg = in_avg > 0
    else:
        has_avg = True
    if has_avg:
        avg_line = dom & (jnp.abs(pos_x - in_avg) < 1e-3) & (in_avg > 0)
        viz = jnp.where(avg_line, const_rgb(0.5, 0.5, 0.5), viz)

    out_rgb = color[..., :3, :, :]
    out_rgb = out_rgb + (viz - out_rgb) * amask
    if color.shape[-3] > 3:
        return jnp.concatenate([out_rgb, color[..., 3:, :, :]], axis=-3)
    return out_rgb


def tone_with_recovery(maxrgb_pq, tone_fn, cr: float,
                       out_min: float, out_max: float,
                       smoothness: float = 3.5):
    """HDR contrast recovery (reference shaders/colorspace.c:1880-1920):
    tone map a low-passed feature map and re-inject the high-frequency
    detail, mixing by `cr` strength.  `smoothness` is the feature-map
    downscale ratio (reference contrast_smoothness, renderer.c:2112)."""
    if cr <= 0 or smoothness <= 1:
        return tone_fn(maxrgb_pq)
    H, W = maxrgb_pq.shape[-2], maxrgb_pq.shape[-1]
    lh = max(1, int(math.ceil(H / smoothness)))
    lw = max(1, int(math.ceil(W / smoothness)))
    low = ops_sampling.sample_bilinear(maxrgb_pq, lh, lw)
    cfg = flt.find_filter_config("bicubic")
    lowres = ops_sampling.resize_separable(low, H, W, cfg)
    base = tone_fn(maxrgb_pq)
    detail = maxrgb_pq - lowres
    sharp = tone_fn(lowres) + detail
    mixed = base + (sharp - base) * cr
    return jnp.clip(mixed, out_min, out_max)


class Renderer:
    """Holds the compiled-pipeline cache and (later) temporal state:
    HDR peak detection, frame mixing FBO pool analogs
    (reference pl_renderer_t, renderer.c:56-93)."""

    def __init__(self, ctx=None):
        # optional runtime.TpuContext; carries the artifact cache that
        # save()/load() serialize (reference: pl_renderer_create takes
        # the pl_gpu whose pl_cache backs pl_renderer_save/load)
        self.ctx = ctx
        self._cache: Dict[tuple, object] = {}
        self.errors: set = set()     # degradation flags (PL_RENDER_ERR_*)
        # HDR peak-detection temporal state (reference: SSBO + CPU copy;
        # here a tiny carried device array)
        self._peak_state = ops_peak.peak_detect_state_init()
        self._frame_idx = 0   # temporal dither phase counter
        # misbehaving user hooks, auto-disabled by signature
        # (reference rr->disabled_hooks, renderer.c:64-65)
        self._disabled_hooks: set = set()
        # cross-frame hook state: (hook signature, name) -> carried
        # array (STORAGE textures/buffers — persistent objects on the
        # hook in the reference, custom_mpv.c:444-450,529-530)
        self._hook_states: Dict[tuple, object] = {}
        # persistent XLA compile cache, on by default (opt out with
        # LPTPU_XLA_CACHE_DIR=0) — cold Mosaic compiles are minutes
        from ..core.cache import enable_default_xla_cache
        enable_default_xla_cache()
        # optional telemetry (reference pl_render_params.info_callback);
        # when set, renders are synced and timed into rolling windows
        self.telemetry = None

    # -- pipeline stages (traced) -------------------------------------

    @staticmethod
    def _ref_plane_index(plane_metas):
        ref_i, best = 0, -1
        for i, (shape, mapping, sx, sy) in enumerate(plane_metas):
            if 0 in mapping and shape[-2] * shape[-1] > best:
                best = shape[-2] * shape[-1]
                ref_i = i
        return ref_i

    @staticmethod
    def _plane_hook_stage(mapping, repr_sys=None):
        """Which per-plane input hook stage a plane feeds (reference
        PL_HOOK_{LUMA,CHROMA,ALPHA,RGB,XYZ}_INPUT, renderer.c:1431)."""
        from .hooks import HookStage
        from ..core.colorspace import ColorSystem
        ms = set(mapping)
        if ms == {0}:
            return HookStage.LUMA_INPUT, HookStage.LUMA_INPUT
        if ms <= {1, 2}:
            return HookStage.CHROMA_INPUT, HookStage.CHROMA_SCALED
        if ms == {3}:
            return HookStage.ALPHA_INPUT, HookStage.ALPHA_SCALED
        if {0, 1, 2} <= ms:
            # XYZ-encoded frames' combined planes hook at XYZ, not RGB
            # (reference PLANE_XYZ -> PL_HOOK_XYZ_INPUT, renderer.c:1436)
            if repr_sys == ColorSystem.XYZ:
                return HookStage.XYZ_INPUT, None
            return HookStage.RGB_INPUT, None
        return None, None

    def _merge_planes(self, planes, frame_meta, params: RenderParams,
                      grain_cfgs=None, grain_tables=None,
                      scaling_shift: int = 8, field=None,
                      first_field=None, prev_planes=None,
                      next_planes=None, h274_grain=None, hook_ctx=None,
                      frame_repr=None, src_max_luma: float = 0.0):
        """Per-plane processing (deband, film grain, plane hooks) then
        alignment to the reference grid and channel stacking (reference
        pass_read_image, renderer.c:1553: plane_deband ->
        plane_film_grain -> plane hooks -> sampler)."""
        from .hooks import HookRect, run_hooks
        plane_metas, repr_sys = frame_meta
        ref_i = self._ref_plane_index(plane_metas)
        luma_full = None
        if 0 in plane_metas[ref_i][1]:
            luma_full = planes[ref_i][
                ..., plane_metas[ref_i][1].index(0), :, :]

        processed = []
        for i, ((shape, mapping, sx, sy), data) in enumerate(
                zip(plane_metas, planes)):
            ph, pw = shape[-2], shape[-1]
            if params.deinterlace is not None and field is not None:
                from ..ops import deinterlace as ops_di
                data = ops_di.deinterlace(
                    data, field, params.deinterlace,
                    prev=prev_planes[i] if prev_planes else None,
                    next=next_planes[i] if next_planes else None,
                    first_field=first_field or field)
            if params.deband is not None and 3 not in mapping:
                # reference plane_deband (renderer.c:1318-1342): grain
                # amplitude is divided by the source's nominal peak so
                # the noise intensity is source-independent, and the
                # "no grain near black / neutral chroma" anchor follows
                # this plane's channels
                dp = params.deband
                if src_max_luma > 0:
                    from ..core.colorspace import COLOR_SDR_WHITE
                    dp = replace(dp, grain=dp.grain /
                                 (src_max_luma / COLOR_SDR_WHITE))
                ntr = ops_deband.plane_grain_neutral(
                    frame_repr, mapping) if frame_repr is not None \
                    else None
                data = ops_deband.deband(data, dp, seed=i, neutral=ntr)
            if h274_grain is not None and 3 not in mapping:
                from ..ops import film_grain_h274 as ops_h274
                from ..core.colorspace import system_is_ycbcr_like
                data = ops_h274.apply_h274_grain(
                    data, h274_grain, tuple(mapping),
                    is_ycbcr=system_is_ycbcr_like(repr_sys))
            if grain_cfgs is not None and grain_cfgs[i] is not None:
                cfg_g = grain_cfgs[i]
                luma = None
                if 0 not in mapping and luma_full is not None:
                    # nearest-subsampled luma at this plane's grid
                    # (reference texelFetch at pos << sub); MXU
                    # column-select — a lane-dim strided slice here
                    # costs 5 ms/frame (ops_fg.subsample_nearest)
                    luma = ops_fg.subsample_nearest(
                        luma_full, cfg_g.sub_x, cfg_g.sub_y, ph, pw)
                data = ops_fg.apply_av1_grain(
                    data, grain_tables[i], cfg_g, scaling_shift, luma=luma)
            # per-plane input hooks; these may RESIZE the plane (e.g.
            # FSRCNNX doubles luma before the main scaler)
            stage_in, stage_scaled = self._plane_hook_stage(mapping,
                                                            repr_sys)
            # //!OFFSET accumulator for this plane's hooks (reference:
            # each pass texture carries a rect, custom_mpv.c:1533-1551)
            hr = HookRect()
            if params.hooks and stage_in is not None:
                data = run_hooks(params.hooks, stage_in, data,
                                 self._disabled_hooks, rect=hr,
                                 **(hook_ctx or {}))
            processed.append((shape, mapping, sx, sy, data,
                              stage_scaled, hr))

        # the reference grid: the (possibly hook-resized) ref plane
        H, W = (processed[ref_i][4].shape[-2],
                processed[ref_i][4].shape[-1])
        # the ref plane's own declared offset shifts the MAIN crop
        # instead (the combined image's rect comes from the ref plane in
        # the reference too); it is never resampled at merge
        hr_ref = processed[ref_i][6]
        if hr_ref.align:
            hr_ref.ox = hr_ref.oy = 0.0     # aligning the ref to itself
        ref_off = (hr_ref.ox, hr_ref.oy)
        # direction-aware plane scaler selection (reference
        # sample_src_info, renderer.c:632-645: plane_upscaler/
        # plane_downscaler override the main scalers; None inherits)
        up_cfg = _find_scaler(params.plane_upscaler or params.upscaler)
        down_cfg = _find_scaler(params.plane_downscaler or params.downscaler)
        channels = {}
        for (shape, mapping, sx, sy, data, stage_scaled, hr) in processed:
            ph, pw = data.shape[-2], data.shape[-1]
            if hr.align:
                # //!OFFSET ALIGN pins this plane to the reference grid:
                # the chroma-siting offset is discarded (reference
                # custom_mpv.c:1544-1550 re-anchors the rect to the
                # scaled src_rect)
                sx = sy = 0.0
            # this plane's declared offset relative to the (possibly
            # offset) reference grid, in THIS plane's texels
            ox = 0.0 if hr is hr_ref else hr.ox - ref_off[0] * pw / W
            oy = 0.0 if hr is hr_ref else hr.oy - ref_off[1] * ph / H
            if (ph, pw) == (H, W) and (sx or sy) and not ox and not oy \
                    and not params.correct_subpixel_offsets:
                # reference default: a pure subpixel siting offset on a
                # same-size plane snaps to the nearest texel instead of
                # resampling (renderer.h:322)
                pass
            elif (ph, pw) != (H, W) or sx or sy or ox or oy:
                cfg = down_cfg if (ph > H or pw > W) else up_cfg
                s0x = -sx * pw / W + ox
                s0y = -sy * ph / H + oy
                rect = RectF(s0x, s0y, s0x + pw, s0y + ph)
                if cfg.polar:
                    # inherited EWA configs run the real polar sampler
                    # for plane alignment too (reference dispatch_sampler
                    # makes no distinction)
                    from ..ops import polar as ops_polar
                    data = ops_polar.sample_polar(
                        data, cfg, H, W, rect,
                        antiring=params.antiringing_strength or cfg.antiring)
                else:
                    data = ops_sampling.resize_separable(
                        data, H, W, cfg, rect,
                        antiring=params.antiringing_strength
                        or cfg.antiring)
                if params.hooks and stage_scaled is not None:
                    data = run_hooks(params.hooks, stage_scaled, data,
                                     self._disabled_hooks,
                                     **(hook_ctx or {}))
            for ci, ch in enumerate(mapping):
                channels[ch] = data[..., ci, :, :]
        order = sorted(channels)
        img = jnp.stack([channels[c] for c in order], axis=-3)
        return img, order, (H, W), ref_off

    def _grain_cfgs(self, plane_metas, frame_repr, frame_grain):
        """Per-plane static grain configs (None = no grain)."""
        if not ops_fg.needs_fg(frame_grain):
            return None, 8
        from ..core.colorspace import levels_guess, system_is_ycbcr_like
        ref_i = self._ref_plane_index(plane_metas)
        ref_shape = plane_metas[ref_i][0]
        H, W = ref_shape[-2], ref_shape[-1]
        bits = max(frame_repr.bits.color_depth or 8, 8)
        limited = levels_guess(frame_repr) == ColorLevels.LIMITED
        is_ycbcr = system_is_ycbcr_like(frame_repr.sys)
        cfgs = []
        for shape, mapping, sx, sy in plane_metas:
            ph, pw = shape[-2], shape[-1]
            sub_x = 1 if pw * 2 <= W else 0
            sub_y = 1 if ph * 2 <= H else 0
            cfg = ops_fg.grain_cfg_for(
                frame_grain, tuple(mapping), bits=min(bits, 12),
                sub_x=sub_x, sub_y=sub_y, limited_range=limited,
                is_ycbcr=is_ycbcr)
            cfgs.append(cfg if any(cfg.active) else None)
        return cfgs, frame_grain.av1.scaling_shift

    def _trace_pipeline(self, frame_meta_key, target: Target,
                        params: RenderParams, frame_repr: ColorRepr,
                        frame_color: ColorSpace, crop: RectF,
                        frame_grain=None, field=None, first_field=None,
                        has_prev=False, has_next=False, rotation=0,
                        overlays=(), frame_icc=None, dither_phase=0,
                        shard_hints=None):
        """Build the traced pipeline function for one signature.
        `dither_phase` rotates the temporal dither pattern (reference
        pl_dispatch temporal index, dispatch.c:1613): with
        dither.temporal set, 8 phase variants compile (one-time via the
        persistent cache) and the renderer cycles them per frame."""
        if params.ignore_icc_profiles:
            # reference pl_render_params.ignore_icc_profiles: fall back
            # to the colorimetric metadata for both ends
            frame_icc = None
            if target.icc is not None:
                target = replace(target, icc=None)

        def linearize_src(x):
            """Source signal -> linear NORM: through the frame's ICC
            profile when attached (reference: image profiles override
            the standard characterization, pl_icc_decode)."""
            if frame_icc is not None:
                from ..ops import icc as ops_icc
                return ops_icc.decode_profile(
                    x, frame_icc, primaries_get(src_color.primaries),
                    **ops_icc.params_kwargs(params))
            return ops_color.linearize(x, src_color)
        plane_metas = frame_meta_key[0]
        # joint src/dst inference (reference pl_color_space_infer_map,
        # colorspace.c:946: the target defaults against the source and
        # dynamic black points are shared); unknown target primaries
        # first default by display size (pass_fix_frames analog)
        dst_raw = target.color
        if dst_raw.primaries == ColorPrimaries.UNKNOWN:
            dst_raw = ColorSpace(primaries_guess(target.w, target.h),
                                 dst_raw.transfer, dst_raw.hdr)
        src_color, dst_color = color_space_infer_map(frame_color, dst_raw)
        grain_cfgs = None
        scaling_shift = 8
        h274_grain = None
        if params.film_grain and frame_grain is not None:
            if frame_grain.type == "av1":
                grain_cfgs, scaling_shift = self._grain_cfgs(
                    plane_metas, frame_repr, frame_grain)
            elif frame_grain.type == "h274":
                from ..ops import film_grain_h274 as ops_h274
                if ops_h274.needs_fg_h274(frame_grain):
                    h274_grain = frame_grain

        # peak detection works with every dynamic-capable curve
        # (reference: the LUT is regenerated from the detected peak for
        # ANY function); st2094-40 with HDR10+ OOTF anchors stays on the
        # static metadata-driven curve instead
        from ..ops.tone_dynamic import DYNAMIC_TONE_FUNCTIONS
        _tm_fn = params.tone_mapping_function
        use_peak = (params.peak_detect is not None and src_color.is_hdr()
                    and (src_color.primaries != dst_color.primaries or
                         src_color.transfer != dst_color.transfer)
                    and _tm_fn in DYNAMIC_TONE_FUNCTIONS
                    and not (_tm_fn == "st2094-40"
                             and src_color.hdr.ootf is not None))

        n_planes = len(plane_metas)

        ref_shape0 = plane_metas[self._ref_plane_index(plane_metas)][0]

        # cross-frame hook state (STORAGE textures/buffers in mpv user
        # shaders): static per-hook name lists; values thread through
        # the jit signature like the peak state
        hook_state_specs = tuple(
            (h, tuple(sorted(getattr(h, "state_spec", None) or ())))
            for h in params.hooks if getattr(h, "state_spec", None))

        def pipeline(peak_state, grain_tables, temporal, overlay_datas,
                     dovi_packed, hook_states, *planes):
            # ---- pass_read_image
            # temporal: (prev_planes, next_planes[, target_data]) — the
            # optional third entry carries existing target contents for
            # blending (reference pl_render_params.blend_params)
            prev_planes, next_planes = temporal[0], temporal[1]
            target_data = temporal[2] if len(temporal) > 2 else None
            dst_crop = target.crop or RectF(0, 0, target.w, target.h)
            dst_w = int(round(dst_crop.w))
            dst_h = int(round(dst_crop.h))
            hook_ctx = dict(dst_w=dst_w, dst_h=dst_h)
            hstates = None
            if hook_state_specs:
                hstates = {}
                idx = 0
                for h, names in hook_state_specs:
                    hstates[h.signature] = (
                        {n: hook_states[idx + i]
                         for i, n in enumerate(names)}, {})
                    idx += len(names)
                hook_ctx["states"] = hstates
            img, order, (H_act, W_act), ref_off = self._merge_planes(
                planes, (plane_metas, frame_repr.sys), params,
                grain_cfgs, grain_tables, scaling_shift,
                field=field, first_field=first_field,
                prev_planes=prev_planes, next_planes=next_planes,
                h274_grain=h274_grain, hook_ctx=hook_ctx,
                frame_repr=frame_repr,
                src_max_luma=src_color.hdr.max_luma)
            # plane hooks may resize (FSRCNNX doubles luma): scale the
            # source crop into the hooked grid (reference: hook rect
            # transforms, custom.h:214-230)
            if (H_act, W_act) != (ref_shape0[-2], ref_shape0[-1]):
                fy = H_act / ref_shape0[-2]
                fx = W_act / ref_shape0[-1]
                crop_eff = RectF(crop.x0 * fx, crop.y0 * fy,
                                 crop.x1 * fx, crop.y1 * fy)
            else:
                crop_eff = crop
            has_alpha = 3 in order
            if has_alpha:
                alpha = img[..., -1:, :, :]
                img = img[..., :3, :, :]
                # premultiplied alpha -> independent for processing
                # (reference pl_shader_decode_color alpha handling)
                from ..core.colorspace import AlphaMode
                if frame_repr.alpha == AlphaMode.PREMULTIPLIED:
                    img = img / jnp.maximum(alpha, 1e-6)
            from .hooks import HookRect, HookStage, run_hooks
            # main-image sampling-rect accumulator (//!OFFSET): seeded
            # with the ref plane's declared offset, extended by the
            # NATIVE..PREKERNEL hook stages, consumed by the main crop
            hr_main = HookRect()
            hr_main.ox, hr_main.oy = ref_off
            h_pre, w_pre = img.shape[-2], img.shape[-1]
            img = run_hooks(params.hooks, HookStage.NATIVE, img,
                            self._disabled_hooks, rect=hr_main,
                            **hook_ctx)
            # NATIVE hooks may resize: fold the scale into the crop
            # (pre-rotation axes; the crop lives in rotated space, so a
            # quarter turn swaps which axis each factor applies to)
            sx_n = img.shape[-1] / w_pre
            sy_n = img.shape[-2] / h_pre
            if rotation % 2:
                sx_n, sy_n = sy_n, sx_n
            img = ops_color.decode_color(
                img, frame_repr, src_color.primaries,
                dovi_packed=dovi_packed,
                adjustment=params.color_adjustment)
            # rotation (reference coalesces pl_frame.rotation into the
            # target; here the decoded image rotates before scaling)
            if rotation % 4:
                img = jnp.rot90(img, k=int(rotation), axes=(-2, -1))
                if has_alpha:
                    alpha = jnp.rot90(alpha, k=int(rotation), axes=(-2, -1))
                hr_main.rotate(rotation)
                if shard_hints and "post_rotate" in shard_hints:
                    # multi-chip GSPMD: re-anchor the rotated image to
                    # row sharding HERE so the partitioner reshards with
                    # ONE all-to-all (without the hint it emits a
                    # masked-sum all-reduce of 2x the frame;
                    # MULTICHIP_PERF.json r3)
                    img = shard_hints["post_rotate"](img)
                    if has_alpha:
                        alpha = shard_hints["post_rotate"](alpha)
            h_rot, w_rot = img.shape[-2], img.shape[-1]
            img = run_hooks(params.hooks, HookStage.RGB, img,
                            self._disabled_hooks, rect=hr_main,
                            **hook_ctx)
            if params.lut is not None and params.lut_type == "native":
                from ..ops import lut as ops_lut
                img = ops_lut.apply_lut(img, params.lut)

            def _crop_with_hooks(c, img_now):
                """Fold main-stage hook resizes + accumulated //!OFFSET
                into the sampling crop: crop' = S_total * crop + acc
                (reference rect math, custom_mpv.c:1533-1541)."""
                sx = sx_n * (img_now.shape[-1] / w_rot)
                sy = sy_n * (img_now.shape[-2] / h_rot)
                if (sx, sy) == (1.0, 1.0) and \
                        not hr_main.ox and not hr_main.oy:
                    return c
                return RectF(c.x0 * sx + hr_main.ox,
                             c.y0 * sy + hr_main.oy,
                             c.x1 * sx + hr_main.ox,
                             c.y1 * sy + hr_main.oy)

            # ---- pass_scale_main
            crop_probe = _crop_with_hooks(crop_eff, img)
            src_h = crop_probe.y1 - crop_probe.y0
            src_w = crop_probe.x1 - crop_probe.x0
            needs_scale = (abs(src_h - dst_h) > 1e-6 or
                           abs(src_w - dst_w) > 1e-6 or
                           crop_probe.x0 != 0 or crop_probe.y0 != 0)
            upscaling = dst_w > src_w or dst_h > src_h

            use_linear = (params.linear_scaling and needs_scale
                          and not params.disable_linear_scaling)
            use_sigmoid = (use_linear and params.sigmoid is not None
                           and not src_color.is_hdr())
            if use_linear:
                img = linearize_src(img)
                img = run_hooks(params.hooks, HookStage.LINEAR, img,
                                self._disabled_hooks, rect=hr_main,
                                **hook_ctx)
                if use_sigmoid:
                    sig = SigmoidParams(*params.sigmoid)
                    img = ops_color.sigmoidize(img, sig)
                    img = run_hooks(params.hooks, HookStage.SIGMOID, img,
                                    self._disabled_hooks, rect=hr_main,
                                    **hook_ctx)

            img = run_hooks(params.hooks, HookStage.PRE_KERNEL, img,
                            self._disabled_hooks, rect=hr_main,
                            **hook_ctx)
            # final sampling crop: all main-stage hook resizes + offsets
            # folded in; LINEAR..PREKERNEL hooks may have extended it
            crop_eff = _crop_with_hooks(crop_eff, img)
            if not needs_scale and (crop_eff.x0 or crop_eff.y0 or
                                    abs(crop_eff.h - dst_h) > 1e-6 or
                                    abs(crop_eff.w - dst_w) > 1e-6):
                needs_scale = True
            phased = None
            if needs_scale:
                up = _find_scaler(params.upscaler)
                down = _find_scaler(params.downscaler)
                cfg = up if upscaling else down
                if cfg.polar:
                    from ..ops import polar as ops_polar
                    # phase-block tail (EXPERIMENTAL, default off): keep
                    # the EWA phases as separate row blocks through the
                    # pointwise tail and interleave once at the end.
                    # Measured SLOWER on TPU v5e (79.7 vs 88.0 fps r2):
                    # the deferred interleave costs the same retiling
                    # copy, and the block concat adds a materialization.
                    # Kept behind LPTPU_PHASED_TAIL=1 for future layout
                    # experiments (exact parity is tested).
                    import os as _os
                    if (_os.environ.get("LPTPU_PHASED_TAIL") == "1"
                            and not params.hooks and not overlays
                            and params.error_diffusion is None
                            and params.contrast_recovery == 0.0
                            and params.corner_rounding == 0.0
                            and not has_alpha
                            and (dst_w, dst_h) == (target.w, target.h)
                            and int(round(dst_crop.x0)) == 0
                            and int(round(dst_crop.y0)) == 0):
                        pg = ops_polar.phase_geometry(
                            cfg, img.shape[-2], img.shape[-1],
                            dst_h, dst_w, crop_eff)
                        if pg is not None:
                            Py_, Px_ = pg
                            Hb, Wb = dst_h // Py_, dst_w // Px_
                            ok = True
                            if use_peak:
                                ok = (16 % Py_ == 0 and 16 % Px_ == 0 and
                                      Hb % (16 // Py_) == 0 and
                                      Wb % (16 // Px_) == 0)
                            if ok:
                                phased = (Py_, Px_, Hb, Wb)
                    img = ops_polar.sample_polar(
                        img, cfg, dst_h, dst_w, crop_eff,
                        antiring=params.antiringing_strength or cfg.antiring,
                        layout="blocks" if phased else "interleaved")
                    if has_alpha:
                        alpha = ops_polar.sample_polar(
                            alpha, cfg, dst_h, dst_w, crop_eff)
                else:
                    img = ops_sampling.resize_separable(
                        img, dst_h, dst_w, cfg, crop_eff, cfg_down=down,
                        antiring=params.antiringing_strength
                        or cfg.antiring)
                    if has_alpha:
                        alpha = ops_sampling.resize_separable(
                            alpha, dst_h, dst_w, cfg, crop_eff,
                            cfg_down=down)

            img = run_hooks(params.hooks, HookStage.POST_KERNEL, img,
                            self._disabled_hooks, **hook_ctx)
            if use_sigmoid:
                img = ops_color.desigmoidize(img, sig)
            img = run_hooks(params.hooks, HookStage.SCALED, img,
                            self._disabled_hooks, **hook_ctx)

            # ---- pass_convert_colors
            # cone distortion first (reference renderer.c:2192-2247:
            # before feature map / peak detection / color map)
            if params.cone is not None:
                img = ops_color.cone_distort(img, src_color, params.cone,
                                             already_linear=use_linear)
            # ICC profiles replace the nominal transfer on their side of
            # the pipeline, so their presence forces the conversion pass
            # even between nominally-equal colorspaces (reference
            # pl_icc_decode/encode bracket the color pipeline whenever a
            # profile exists, renderer.c:2271)
            need_color_map = (src_color.primaries != dst_color.primaries or
                              src_color.transfer != dst_color.transfer or
                              target.icc is not None or
                              frame_icc is not None)
            new_state = peak_state
            fused_tail = None
            if need_color_map:
                if not use_linear:
                    img = linearize_src(img)
                fused_tail = self._fused_tail(
                    params, src_color, dst_color, target, use_peak,
                    phased, has_alpha, dst_w, dst_h, dst_crop,
                    dither_phase=dither_phase)
                fused_peak = fused_tail is not None and fused_tail.fused_peak
                peak_stats = None
                if use_peak:
                    # src_color is infer()ed: hdr metadata is populated
                    src_max_pq = hdr_rescale(HdrScaling.NITS,
                                             HdrScaling.PQ,
                                             src_color.hdr.max_luma)
                    if fused_peak:
                        # measurement happens inside the fused kernel;
                        # apply the previous frames' smoothed stats
                        peak_stats = ops_peak.delayed_stats(
                            peak_state, src_max_pq)
                    else:
                        avg_pq, max_pq, new_state = ops_peak.applied_stats(
                            img, peak_state, params.peak_detect,
                            src_max_pq, phase_geom=phased)
                        peak_stats = (avg_pq, max_pq)
                if fused_tail is not None:
                    # tone+gamut+delinearize+encode+dither in ONE pass
                    if fused_peak:
                        img, packed = fused_tail(img, peak_stats)
                        _, _, new_state = ops_peak.finish_from_packed(
                            packed, peak_state, params.peak_detect)
                    else:
                        img = fused_tail(img, peak_stats)
                else:
                    img = self._color_map(img, src_color, dst_color,
                                          params, peak_stats)
                    if target.icc is not None:
                        from ..ops import icc as ops_icc
                        img = ops_icc.encode_profile(
                            img, target.icc,
                            primaries_get(dst_color.primaries),
                            **ops_icc.params_kwargs(params, encode=True))
                    else:
                        img = ops_color.delinearize(img, dst_color)
            elif use_linear:
                if target.icc is not None:
                    from ..ops import icc as ops_icc
                    img = ops_icc.encode_profile(
                        img, target.icc, primaries_get(src_color.primaries),
                        **ops_icc.params_kwargs(params, encode=True))
                else:
                    img = ops_color.delinearize(img, src_color)

            # ---- pass_output_target (already folded into the fused
            # Pallas epilogue when fused_tail ran; its eligibility
            # guarantees every skipped stage here is a no-op)
            img = run_hooks(params.hooks, HookStage.PRE_OUTPUT, img,
                            self._disabled_hooks, **hook_ctx)
            if params.lut is not None and params.lut_type == "conversion" \
                    and fused_tail is None:
                from ..ops import lut as ops_lut
                img = ops_lut.apply_lut(img, params.lut)
            if fused_tail is None:
                img = ops_color.encode_color(img, target.repr,
                                             dst_color.primaries)
            img = run_hooks(params.hooks, HookStage.OUTPUT, img,
                            self._disabled_hooks, **hook_ctx)
            if has_alpha:
                from ..core.colorspace import AlphaMode
                if target.repr.alpha == AlphaMode.PREMULTIPLIED:
                    img = img * alpha
                img = jnp.concatenate([img, alpha], axis=-3)

            # affine distortion (reference pl_shader_distort applied at
            # pass_output_target, renderer.c:2655)
            if params.distort is not None:
                from ..ops import distort as ops_distort
                if shard_hints and "replicate" in shard_hints:
                    # a warp can pull any source pixel anywhere: ONE
                    # explicit gather-to-replicated here beats letting
                    # the partitioner re-gather per internal op
                    img = shard_hints["replicate"](img)
                img = ops_distort.distort_image(img, dst_w, dst_h,
                                                params.distort)

            # composite into the full target with border fill (reference
            # clear_target, renderer.c:2491) when the dst crop doesn't
            # cover the whole target
            x0 = int(round(dst_crop.x0))
            y0 = int(round(dst_crop.y0))
            if (dst_w, dst_h) != (target.w, target.h) or x0 or y0:
                border = "skip" if params.skip_target_clearing else \
                    (params.border or params.background)
                if border == "blur":
                    canvas = self._blur_border(params, img, target.h,
                                               target.w)
                elif border == "skip":
                    # no preexisting target contents exist here: skip =
                    # transparent black (reference PL_CLEAR_SKIP leaves
                    # the target untouched)
                    canvas = jnp.zeros(img.shape[:-2] +
                                       (target.h, target.w), img.dtype)
                else:
                    canvas = self._background(params, img.shape[-3],
                                              target.h, target.w,
                                              mode=border)
                img = jax.lax.dynamic_update_slice(
                    canvas, img, (0,) * (img.ndim - 3) + (0, y0, x0))

            # corner rounding (reference renderer.c:2615): an antialiased
            # rounded-rect mask blends the frame toward the background.
            # The mask is static per geometry — host-computed, baked.
            if params.corner_rounding > 0:
                r_px = params.corner_rounding * min(target.h, target.w) / 2
                yy, xx = np.mgrid[0:target.h, 0:target.w] + 0.5
                cx = np.clip(xx, r_px, target.w - r_px)
                cy = np.clip(yy, r_px, target.h - r_px)
                d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
                mask = jnp.asarray(
                    np.clip(r_px + 0.5 - d, 0.0, 1.0).astype(np.float32))
                bg = self._background(params, img.shape[-3],
                                      target.h, target.w)
                img = bg + (img - bg) * mask

            # reference renderer.c:2888: dither when depth < 16 (or
            # forced); 16-bit outputs have enough levels on their own
            if target.bit_depth and \
                    (fused_tail is None or params.error_diffusion) and \
                    (target.bit_depth < 16 or params.force_dither):
                if params.error_diffusion:
                    from ..core.dither import find_error_diffusion_kernel
                    k = find_error_diffusion_kernel(params.error_diffusion)
                    if shard_hints and "replicate" in shard_hints:
                        # the ED wavefront is whole-frame serial: ONE
                        # gather-to-replicated here, then the kernel
                        # runs as a manual (shard_map) region so the
                        # partitioner cannot shard its interpret-mode
                        # loop innards (see _build_gspmd_step); the
                        # final re-shard is a local slice
                        img = shard_hints["replicate"](img)
                        ed = lambda t: ops_dither.error_diffusion(
                            t, target.bit_depth, k)
                        if "manual" in shard_hints:
                            img = shard_hints["manual"](ed)(img)
                        else:
                            img = shard_hints["replicate"](ed(img))
                    else:
                        img = ops_dither.error_diffusion(
                            img, target.bit_depth, k)
                elif params.dither is not None:
                    dp = replace(params.dither,
                                 transfer=dst_color.transfer) \
                        if params.dither.transfer == ColorTransfer.UNKNOWN \
                        else params.dither
                    if params.disable_dither_gamma_correction:
                        dp = replace(dp, transfer=ColorTransfer.LINEAR)
                    bias = None
                    if phased:
                        from ..ops import polar as ops_polar
                        bias = jnp.asarray(ops_polar.to_phase_blocks(
                            ops_dither._bias_matrix(dp, dst_h, dst_w,
                                                    dither_phase),
                            phased[0], phased[1]))
                    img = ops_dither.dither(img, target.bit_depth, dp,
                                            frame_index=dither_phase,
                                            bias=bias)

            if phased:
                from ..ops import polar as ops_polar
                img = ops_polar.interleave_phases(
                    img, phased[0], phased[1], dst_h, dst_w)

            # target blending (reference pl_render_params.blend_params:
            # the final pass writes with hardware blending against the
            # existing target contents)
            if params.blend is not None and target_data is not None:
                img = self._blend_target(img, target_data, params.blend)

            # overlays (subtitles/OSD; reference draw_overlays,
            # renderer.c:811) blend after dithering, like the reference's
            # final vertex pass
            for ov_i, (ov, is_tgt) in enumerate(overlays):
                img = self._blend_overlay(
                    img, overlay_datas[ov_i], ov, is_tgt, target,
                    dst_color, params, crop, dst_crop, rotation,
                    (ref_shape0[-2], ref_shape0[-1]))
            hs_out = ()
            if hook_state_specs:
                outs = []
                for h, names in hook_state_specs:
                    sin, sout = hstates[h.signature]
                    # disabled / skipped hooks carry their state through
                    outs.extend(sout.get(n, sin[n]) for n in names)
                hs_out = tuple(outs)
            return jnp.clip(img, 0.0, 1.0), new_state, hs_out

        return pipeline

    @staticmethod
    def _blend_target(src, dst, blend):
        """Blend `src` over existing target contents `dst` with the
        (src_rgb, dst_rgb, src_alpha, dst_alpha) factor names of
        reference pl_blend_params (gpu.h:1145-1158): each factor is one
        of zero|one|src_alpha|one_minus_src_alpha."""
        src_rgb_f, dst_rgb_f, src_a_f, dst_a_f = blend
        has_a = src.shape[-3] > 3
        sa = src[..., 3:4, :, :] if has_a else \
            jnp.ones_like(src[..., :1, :, :])
        dst_has_a = dst.shape[-3] > 3

        def factor(name, alpha):
            if name == "zero":
                return 0.0
            if name == "one":
                return 1.0
            if name == "src_alpha":
                return alpha
            if name == "one_minus_src_alpha":
                return 1.0 - alpha
            raise ValueError(f"unknown blend factor {name!r}")

        out_rgb = src[..., :3, :, :] * factor(src_rgb_f, sa) + \
            dst[..., :3, :, :] * factor(dst_rgb_f, sa)
        if has_a or dst_has_a:
            da = dst[..., 3:4, :, :] if dst_has_a else \
                jnp.ones_like(sa)
            out_a = sa * factor(src_a_f, sa) + da * factor(dst_a_f, sa)
            return jnp.concatenate([out_rgb, out_a], axis=-3)
        return out_rgb

    @staticmethod
    def _blur_border(params: RenderParams, img, th: int, tw: int):
        """border="blur": a blurred copy of the image stretched to cover
        the target (reference PL_CLEAR_BLUR, pass_blur renderer.c:2345:
        a dual-filter pyramid; here an iterative half-resolution bilinear
        pyramid with the same pass count, then one cover-resize)."""
        radius = max(params.blur_radius, 1e-3)
        a_max = 1.8
        passes = int(math.ceil(
            math.log(1.0 + radius * radius / (a_max * a_max)) /
            math.log(4.0)))
        passes = min(max(passes, 2), 10)
        x = img
        for _ in range(passes):
            nh = max(1, x.shape[-2] // 2)
            nw = max(1, x.shape[-1] // 2)
            x = ops_sampling.sample_bilinear(x, nh, nw)
            if nh == 1 and nw == 1:
                break
        # cover-resize: scale so the blurred image fills the target,
        # cropping the overflow about the center
        sh_, sw_ = x.shape[-2], x.shape[-1]
        scale = max(th / sh_, tw / sw_)
        crop_h, crop_w = th / scale, tw / scale
        cy, cx = sh_ / 2, sw_ / 2
        rect = RectF(cx - crop_w / 2, cy - crop_h / 2,
                     cx + crop_w / 2, cy + crop_h / 2)
        cfg = _find_scaler("bilinear")
        return ops_sampling.resize_separable(x, th, tw, cfg, rect)

    @staticmethod
    def _background(params: RenderParams, comps: int, h: int, w: int,
                    mode: Optional[str] = None):
        """Border fill canvas (solid color or checkerboard tiles)."""
        bg = mode or params.background
        if bg == "tiles":
            ts = params.tile_size
            yy, xx = np.meshgrid(np.arange(h) // ts, np.arange(w) // ts,
                                 indexing="ij")
            sel = ((yy + xx) % 2).astype(np.float32)
            c0 = np.asarray(params.tile_colors[0], np.float32)
            c1 = np.asarray(params.tile_colors[1], np.float32)
            tiles = (c0[:, None, None] * (1 - sel) +
                     c1[:, None, None] * sel)
            if comps > 3:
                tiles = np.concatenate(
                    [tiles, np.ones((comps - 3, h, w), np.float32)])
            return jnp.asarray(tiles[:comps])
        col = np.zeros(comps, np.float32)
        col[:3] = np.asarray(params.background_color, np.float32)[:3]
        if comps > 3:
            col[3] = 1.0 - params.background_transparency
        return jnp.broadcast_to(
            jnp.asarray(col)[:, None, None], (comps, h, w))

    @staticmethod
    def overlay_is_simple(ov) -> bool:
        """The legacy whole-texture-at-target-rect shorthand: normal
        mode, auto coords, no parts, no encoding metadata of its own.
        The sharded halo pipeline handles exactly this shape; everything
        richer routes through the GSPMD fallback."""
        from ..core.colorspace import (AlphaMode, ColorLevels, ColorSystem)
        return (ov.mode == "normal" and ov.coords == "auto"
                and not ov.parts and ov.rect is not None
                and ov.repr.sys in (ColorSystem.UNKNOWN, ColorSystem.RGB)
                and ov.repr.levels in (ColorLevels.UNKNOWN,
                                       ColorLevels.FULL)
                and ov.repr.alpha != AlphaMode.PREMULTIPLIED
                and ov.color == ColorSpace())

    @staticmethod
    def _overlay_rect_map(coords: str, is_target: bool, crop: RectF,
                          dst_crop: RectF, rotation: int,
                          frame_w: int, frame_h: int, target: Target):
        """Host mapping from an overlay part's coordinate space to
        target coordinates, plus the content rotation to apply
        (reference draw_overlays transform setup, renderer.c:830-886).

        Legacy shorthand (no parts): rect is already target-space, so
        callers pass coords="dst_frame" for it.  "src_frame" parts are
        raw (unrotated) frame coordinates and rotate alongside the
        image; "src_crop" parts are relative to the crop, which in this
        renderer lives in post-rotation space (the rotation coalescing
        differs from the reference — frames rotate before cropping)."""
        if coords == "auto":
            coords = "dst_frame" if is_target else "src_frame"
        r = int(rotation) % 4
        if coords in ("src_frame", "src_crop"):
            cw = crop.w or 1.0
            ch = crop.h or 1.0
            rx = dst_crop.w / cw
            ry = dst_crop.h / ch

            def map_pt(x, y):
                if coords == "src_frame":
                    if r == 1:      # jnp.rot90 k=1: (x,y) -> (y, W-x)
                        x, y = y, frame_w - x
                    elif r == 2:
                        x, y = frame_w - x, frame_h - y
                    elif r == 3:
                        x, y = frame_h - y, x
                    u, v = x - crop.x0, y - crop.y0
                else:
                    u, v = x, y
                return (dst_crop.x0 + rx * u, dst_crop.y0 + ry * v)
            rot_content = r if coords == "src_frame" else 0
        else:
            tcrop = (target.crop or
                     RectF(0, 0, target.w, target.h)).normalized()
            ox = tcrop.x0 if coords == "dst_crop" else 0.0
            oy = tcrop.y0 if coords == "dst_crop" else 0.0

            def map_pt(x, y):
                return (x + ox, y + oy)
            rot_content = 0
        return map_pt, rot_content

    @staticmethod
    def _overlay_to_target(rgb, ov, target: Target, dst_color, params):
        """Convert overlay color to the target encoding: decode repr ->
        linearize -> primaries matrix -> clip into the target range ->
        (icc|delinearize) -> encode (the reference's linear-tone-map +
        saturation-gamut OSD color map, renderer.c:962-991).
        Passthrough when the overlay carries no encoding metadata of
        its own (the legacy already-target-encoded shorthand)."""
        from ..core.colorspace import (ColorLevels, ColorSystem,
                                       color_mapping_matrix,
                                       color_space_infer_map)
        plain_repr = (ov.repr.sys in (ColorSystem.UNKNOWN, ColorSystem.RGB)
                      and ov.repr.levels in (ColorLevels.UNKNOWN,
                                             ColorLevels.FULL))
        if plain_repr and ov.color == ColorSpace() and target.icc is None:
            return rgb
        ol_color, _ = color_space_infer_map(ov.color, dst_color)
        x = ops_color.decode_color(rgb, ov.repr, ol_color.primaries)
        lin = ops_color.linearize(x, ol_color)
        if ol_color.primaries != dst_color.primaries:
            m = color_mapping_matrix(primaries_get(ol_color.primaries),
                                     primaries_get(dst_color.primaries))
            lin = ops_color.apply_matrix(lin, m.m)
        # linear tone map = clamp into the target's representable range
        _, hi = ops_color.nominal_luma_norm(dst_color)
        lin = jnp.clip(lin, 0.0, hi)
        if target.icc is not None:
            from ..ops import icc as ops_icc
            sig = ops_icc.encode_profile(
                lin, target.icc, primaries_get(dst_color.primaries),
                **ops_icc.params_kwargs(params, encode=True))
        else:
            sig = ops_color.delinearize(lin, dst_color)
        return ops_color.encode_color(sig, target.repr,
                                      dst_color.primaries)

    @classmethod
    def _blend_overlay(cls, img, ov_data, ov, is_target: bool,
                       target: Target, dst_color, params,
                       crop: RectF, dst_crop: RectF, rotation: int,
                       frame_hw):
        """Draw one overlay: every part mapped into target coordinates,
        color-converted, alpha-blended over the output (reference
        draw_overlays, renderer.c:811-1025).  Monochrome overlays use
        the texture's first channel as an alpha map times the part
        color (the libass bitmap contract)."""
        from ..core.colorspace import AlphaMode
        frame_h, frame_w = frame_hw
        parts = ov.get_parts()      # validates mode/coords (user errors
        #                             propagate; they never degrade)
        # legacy shorthand: a bare rect with coords left at "auto" is
        # target-space; an explicit coords choice always wins
        coords = "dst_frame" if (not ov.parts and ov.rect is not None
                                 and ov.coords == "auto") else ov.coords
        map_pt, rot_c = cls._overlay_rect_map(
            coords, is_target, crop, dst_crop, rotation,
            frame_w, frame_h, target)
        th, tw = img.shape[-2], img.shape[-1]
        premul = ov.repr.alpha == AlphaMode.PREMULTIPLIED
        tex_h, tex_w = ov_data.shape[-2], ov_data.shape[-1]
        for part in parts:
            x0f, y0f = map_pt(part.dst.x0, part.dst.y0)
            x1f, y1f = map_pt(part.dst.x1, part.dst.y1)
            d = RectF(x0f, y0f, x1f, y1f).normalized()
            x0, y0 = int(round(d.x0)), int(round(d.y0))
            x1, y1 = int(round(d.x1)), int(round(d.y1))
            ow, oh = x1 - x0, y1 - y0
            if ow <= 0 or oh <= 0:
                continue
            cx0, cy0 = max(x0, 0), max(y0, 0)    # clip to the canvas
            cx1, cy1 = min(x1, tw), min(y1, th)
            if cx0 >= cx1 or cy0 >= cy1:
                continue
            s = part.src.normalized()
            sx0 = min(max(int(round(s.x0)), 0), tex_w - 1)
            sy0 = min(max(int(round(s.y0)), 0), tex_h - 1)
            sx1 = max(min(int(round(s.x1)), tex_w), sx0 + 1)
            sy1 = max(min(int(round(s.y1)), tex_h), sy0 + 1)
            tex = ov_data[..., sy0:sy1, sx0:sx1]
            if rot_c:
                tex = jnp.rot90(tex, k=rot_c, axes=(-2, -1))
            ov_img = ops_sampling.sample_bilinear(tex, oh, ow)
            ov_img = ov_img[..., cy0 - y0:cy1 - y0, cx0 - x0:cx1 - x0]

            if ov.mode == "monochrome":
                mask = ov_img[..., :1, :, :]
                col = tuple(float(c) for c in part.color)
                rgb = jnp.broadcast_to(
                    jnp.asarray(col[:3], img.dtype)[:, None, None],
                    (3,) + mask.shape[-2:])
                a = jnp.full_like(mask, col[3])
            else:
                rgb = ov_img[..., :3, :, :]
                a = ov_img[..., 3:4, :, :] if ov_img.shape[-3] > 3 else \
                    jnp.ones_like(ov_img[..., :1, :, :])
            rgb = cls._overlay_to_target(rgb, ov, target, dst_color,
                                         params)
            if ov.mode == "monochrome":
                if premul:
                    rgb = rgb * mask
                a = a * mask
            # blend factors per reference renderer.c:996-1001:
            # src_rgb = premul ? ONE : SRC_ALPHA, src_alpha = ONE,
            # dst_rgb/alpha = ONE_MINUS_SRC_ALPHA
            comps = img.shape[-3]
            hh, ww = cy1 - cy0, cx1 - cx0
            region = jax.lax.dynamic_slice(
                img, (0,) * (img.ndim - 3) + (0, cy0, cx0),
                img.shape[:-3] + (comps, hh, ww))
            src_rgb = rgb if premul else rgb * a
            out_rgb = src_rgb + region[..., :3, :, :] * (1 - a)
            if comps > 3:
                out_a = a + region[..., 3:, :, :] * (1 - a)
                blended = jnp.concatenate([out_rgb, out_a], axis=-3)
            else:
                blended = out_rgb
            img = jax.lax.dynamic_update_slice(
                img, blended, (0,) * (img.ndim - 3) + (0, cy0, cx0))
        return img

    def _color_map(self, img, src: ColorSpace, dst: ColorSpace,
                   params: RenderParams, peak_stats=None):
        return color_map_stage(img, src, dst, params, peak_stats)

    @staticmethod
    def _fused_tail(params: RenderParams, src_color, dst_color,
                    target: Target, use_peak, phased, has_alpha,
                    dst_w, dst_h, dst_crop, dither_phase=0):
        """Build the fused Pallas color epilogue — ONE kernel for
        tone + gamut + delinearize + encode + dither (the pointwise tail
        after the scaler), reading/writing each 4K tile exactly once
        (ops.pallas.color_map; the analog of the reference composing
        these stages into one fragment shader via sh_subpass).  Returns
        None when the tail is interrupted by non-pointwise features —
        the plain XLA stages run instead."""
        import os
        env = os.environ.get("LPTPU_FUSED_COLORMAP", "auto")
        if env == "0" or params.disable_fused_colormap:
            return None
        from ..ops.pallas import color_map as pl_cm
        if env != "1" and not pl_cm.supported_here():
            return None
        x0 = int(round(dst_crop.x0))
        y0 = int(round(dst_crop.y0))
        eligible = (
            not params.hooks and not has_alpha and phased is None
            and target.icc is None
            and params.distort is None
            and not params.visualize_lut    # needs global pixel coords
            and (params.lut is None or params.lut_type != "conversion")
            and (dst_w, dst_h) == (target.w, target.h) and x0 == 0 == y0
            and params.corner_rounding <= 0
            and params.contrast_recovery == 0.0
            and dst_w % 128 == 0)
        if not eligible:
            return None

        dp = None
        tables = ()
        bit_depth = target.bit_depth
        # with error diffusion the quantization runs as the wavefront
        # Pallas kernel AFTER this tail (it needs the whole encoded
        # frame); everything up to encode still fuses
        if bit_depth and params.dither is not None and \
                params.error_diffusion is None and \
                (bit_depth < 16 or params.force_dither):
            dp = replace(params.dither, transfer=dst_color.transfer) \
                if params.dither.transfer == ColorTransfer.UNKNOWN \
                else params.dither
            if params.disable_dither_gamma_correction:
                dp = replace(dp, transfer=ColorTransfer.LINEAR)
            tables = (ops_dither._bias_matrix(dp, dst_h, dst_w,
                                              dither_phase),)

        # with allow_delayed the tone map uses the previous frames'
        # stats, so the peak partials can be computed INSIDE this very
        # kernel (per-block histogram + stripe stats, the reference's
        # per-workgroup shmem partials) — the separate full-frame peak
        # pass disappears entirely
        fused_peak = bool(use_peak and params.peak_detect.allow_delayed)

        def tail_fn(x, scalars, tbs):
            stats = (scalars[0], scalars[1]) if use_peak else None
            y = color_map_stage(x, src_color, dst_color, params, stats)
            y = ops_color.delinearize(y, dst_color)
            y = ops_color.encode_color(y, target.repr, dst_color.primaries)
            if tbs:
                y = ops_dither.dither(y, bit_depth, dp, bias=tbs[0])
            if fused_peak:
                return y, ops_peak.block_partials(x, params.peak_detect)
            return y

        def run(img, peak_stats):
            scalars = tuple(peak_stats) if use_peak else ()
            if fused_peak:
                return pl_cm.fused_pointwise(
                    img, tail_fn, scalars=scalars, tables=tables,
                    extra_out=(ops_peak.PARTIAL_SHAPE,))
            return pl_cm.fused_pointwise(img, tail_fn, scalars=scalars,
                                         tables=tables)
        run.fused_peak = fused_peak
        return run

    # -- public API ----------------------------------------------------

    def render(self, frame: Frame, target: Target,
               params: Optional[RenderParams] = None) -> jnp.ndarray:
        """Render `frame` into an array of shape (C, target.h, target.w)
        (reference pl_render_image, renderer.c:3433).

        On a trace/compile/runtime failure the renderer degrades
        gracefully: it records an error flag, strips the offending
        feature, and retries — mirroring the reference's pl_render_error
        bits + "disable and continue" recovery (renderer.c:95-115,
        SURVEY §5.3).  Flags persist on the Renderer so later frames
        skip the broken feature without re-failing."""
        params = params or DEFAULT_PARAMS
        # acquire/release hooks (reference pl_frame.acquire/release,
        # renderer.h:565-569; pass_init renderer.c:3206): acquire the
        # frame — plus prev/next for interlaced — before touching its
        # planes; release ALWAYS runs, including after errors
        acq = [f for f in (frame, frame.prev, frame.next)
               if f is not None and f.acquire is not None]
        try:
            for f in acq:
                if not f.acquire(f):
                    raise RenderError("frame acquire() refused the frame")
            return self._render_acquired(frame, target, params)
        finally:
            for f in (frame, frame.prev, frame.next):
                if f is not None and f.release is not None:
                    f.release(f)

    def _render_acquired(self, frame: Frame, target: Target,
                         params: RenderParams) -> jnp.ndarray:
        # apply previously recorded degradations up front
        for flag, strip in _DEGRADE_LADDER:
            if flag in self.errors:
                params = strip(params)
        try:
            return self._render_once(frame, target, params)
        except _NON_DEGRADABLE:
            # user/parameter errors surface unchanged — the reference
            # degrades only on *shader/GPU* failures (renderer.c:777-788),
            # not on invalid inputs
            raise
        except Exception as e:
            first_exc = e
        from ..core.log import default_log
        log = default_log()
        # attribute the failure: try stripping ONE feature at a time, so a
        # broken scaler doesn't permanently disable unrelated features
        for flag, strip in _DEGRADE_LADDER:
            if not _strips_anything(flag, strip, params):
                continue
            try:
                out = self._render_once(frame, target, strip(params))
                self.errors.add(flag)
                log.error(
                    f"render failed ({type(first_exc).__name__}: "
                    f"{first_exc}); disabled {flag!r} and recovered "
                    "(reference PL_RENDER_ERR_* degradation)")
                return out
            except _NON_DEGRADABLE:
                raise
            except Exception:
                continue
        # compound failure: strip cumulatively
        stripped, cur = [], params
        for flag, strip in _DEGRADE_LADDER:
            if not _strips_anything(flag, strip, cur):
                continue
            cur = strip(cur)
            stripped.append(flag)
            try:
                out = self._render_once(frame, target, cur)
                self.errors.update(stripped)
                log.error(
                    f"render failed ({type(first_exc).__name__}: "
                    f"{first_exc}); disabled {stripped} and recovered")
                return out
            except _NON_DEGRADABLE:
                raise
            except Exception:
                continue
        raise first_exc

    def _render_once(self, frame: Frame, target: Target,
                     params: RenderParams) -> jnp.ndarray:
        crop = frame.get_crop()
        # temporal dither rotates among 8 phases per frame (reference
        # pl_dispatch_reset_frame's temporal index, dispatch.c:1613);
        # each phase is its own compiled variant (one-time with the
        # persistent cache), selected per frame here
        dither_phase = 0
        if params.dither is not None and params.dither.temporal and \
                target.bit_depth and target.bit_depth < 16:
            dither_phase = self._frame_idx % 8
        self._frame_idx += 1
        key = (frame.meta_key(), target.meta_key(), params.key(),
               dither_phase)
        # LRU: re-insertion keeps hot pipelines; eviction above the cap
        # mirrors dispatch.c:707's pass GC
        fn = self._cache.pop(key, None)
        if fn is None:
            pipeline = self._trace_pipeline(
                frame.meta_key(), target, params, frame.repr, frame.color,
                crop, frame.film_grain, field=frame.field,
                first_field=frame.first_field,
                has_prev=frame.prev is not None,
                has_next=frame.next is not None,
                rotation=int(frame.rotation),
                overlays=tuple((ov, False) for ov in frame.overlays)
                + tuple((ov, True) for ov in (target.overlays or ())),
                frame_icc=frame.icc, dither_phase=dither_phase)
            fn = jax.jit(pipeline)
        self._cache[key] = fn
        while len(self._cache) > _MAX_CACHED_PIPELINES:
            self._cache.pop(next(iter(self._cache)))

        # per-frame grain tables (traced inputs; host prep cached by seed)
        grain_tables = None
        if params.film_grain and ops_fg.needs_fg(frame.film_grain):
            plane_metas = frame.meta_key()[0]
            cfgs, _ = self._grain_cfgs(plane_metas, frame.repr,
                                       frame.film_grain)
            if cfgs is not None:
                grain_tables = tuple(
                    ops_fg.prepare_av1_grain(
                        frame.film_grain, cfg,
                        meta[0][-2], meta[0][-1]) if cfg else None
                    for cfg, meta in zip(cfgs, plane_metas))

        temporal = (
            tuple(p.data for p in frame.prev.planes) if frame.prev else None,
            tuple(p.data for p in frame.next.planes) if frame.next else None)
        if target.data is not None:
            temporal = temporal + (jnp.asarray(target.data),)
        overlay_datas = tuple(o.data for o in frame.overlays) \
            + tuple(o.data for o in (target.overlays or ()))
        dovi_packed = None
        if frame.repr.sys == ColorSystem.DOLBYVISION and \
                frame.repr.dovi is not None:
            from ..ops.dovi import pack_dovi
            dovi_packed = pack_dovi(frame.repr.dovi)
        # cross-frame hook state (STORAGE textures/buffers): carried
        # values in spec order; shape mismatches (spec changed) re-init
        hook_states = []
        for h in params.hooks:
            spec = getattr(h, "state_spec", None) or {}
            for n in sorted(spec):
                cur = self._hook_states.get((h.signature, n))
                if cur is None or tuple(cur.shape) != np.shape(spec[n]):
                    cur = jnp.asarray(spec[n])
                hook_states.append(cur)
        out, self._peak_state, hs_out = fn(
            self._peak_state, grain_tables, temporal, overlay_datas,
            dovi_packed, tuple(hook_states),
            *[p.data for p in frame.planes])
        if hs_out:
            i = 0
            for h in params.hooks:
                spec = getattr(h, "state_spec", None) or {}
                for n in sorted(spec):
                    self._hook_states[(h.signature, n)] = hs_out[i]
                    i += 1
        if self.telemetry is not None:
            # non-blocking timing (reference pl_timer queries are read
            # opportunistically, gpu.h:403-437): harvest the PREVIOUS
            # frame's dispatch->ready latency now — by this point it has
            # almost surely completed, so the async pipeline (frames in
            # flight) is never serialized by its own measurement
            import time as _time
            pending = getattr(self, "_telemetry_pending", None)
            if pending is not None:
                pt0, pout = pending
                pout.block_until_ready()
                self.telemetry.record("frame", _time.perf_counter() - pt0)
            self._telemetry_pending = (_time.perf_counter(), out)
        return out

    def flush_telemetry(self):
        """Harvest the last in-flight frame's timing (telemetry is
        recorded one frame late to avoid serializing the pipeline)."""
        pending = getattr(self, "_telemetry_pending", None)
        if pending is not None and self.telemetry is not None:
            import time as _time
            pt0, pout = pending
            pout.block_until_ready()
            self.telemetry.record("frame", _time.perf_counter() - pt0)
        self._telemetry_pending = None

    def reset_peak_detection(self):
        """Reference pl_renderer_flush_cache / peak state reset."""
        self._peak_state = ops_peak.peak_detect_state_init()

    def reset_hook_state(self):
        """Drop carried cross-frame hook state (STORAGE textures /
        buffers re-initialize from their declared data on the next
        frame — the reference analog is recreating the hook)."""
        self._hook_states.clear()

    def get_errors(self) -> tuple:
        """Accumulated degradation state: (error flags, disabled hook
        signatures) — features/hooks disabled after a backend failure
        (reference pl_renderer_get_errors, renderer.c:4194)."""
        return (frozenset(self.errors), frozenset(self._disabled_hooks))

    def reset_errors(self, errors=None, hooks=None) -> None:
        """Clear degradation flags so previously-failed features are
        retried (reference pl_renderer_reset_errors, renderer.c:4203).
        With no arguments, clears everything; otherwise clears only the
        named error flags and/or hook signatures."""
        if errors is None and hooks is None:
            self.errors.clear()
            self._disabled_hooks.clear()
            return
        for flag in (errors or ()):
            self.errors.discard(flag)
        for sig in (hooks or ()):
            self._disabled_hooks.discard(sig)

    def flush_cache(self):
        self._cache.clear()
        self.reset_peak_detection()
        self.reset_hook_state()

    def get_hdr_metadata(self):
        """Measured HDR metadata from the peak-detection state, or None
        when nothing has been detected yet (reference
        pl_renderer_get_hdr_metadata, renderer.c:1252 →
        pl_get_detected_hdr_metadata, shaders/colorspace.c:1355).
        Queries the carried device state (a host fetch)."""
        from ..core.colorspace import HdrMetadata
        avg_pq, max_pq = (float(v) for v in np.asarray(self._peak_state))
        if avg_pq == 0.0:
            return None
        return HdrMetadata(max_pq_y=max_pq, avg_pq_y=avg_pq)

    def save(self) -> bytes:
        """Serialize the renderer's persistent artifact cache (reference
        pl_renderer_save, renderer.c:184 — which just serializes the
        GPU's pl_cache; compiled XLA programs live in the persistent
        disk cache instead, core.cache.set_xla_cache_dir)."""
        if self.ctx is not None:
            return self.ctx.cache.save()
        return b""

    def load(self, data: bytes) -> int:
        """Restore a cache blob from `save()` (reference
        pl_renderer_load, renderer.c:189). Returns objects restored."""
        if self.ctx is not None and data:
            return self.ctx.cache.load(data)
        return 0


_default_renderer: Optional[Renderer] = None


def render_image(frame: Frame, target: Target,
                 params: Optional[RenderParams] = None) -> jnp.ndarray:
    """Module-level convenience mirroring pl_render_image."""
    global _default_renderer
    if _default_renderer is None:
        _default_renderer = Renderer()
    return _default_renderer.render(frame, target, params)


def frames_infer(frame: Frame, target: Target):
    """Return (frame', target') with their colorspaces defaulted exactly
    as `Renderer.render` would default them (reference pl_frames_infer,
    renderer.c:3303 → pass_fix_frames): joint src/dst inference via
    pl_color_space_infer_map semantics. Does not touch pixel data."""
    import dataclasses
    dst_raw = target.color
    if dst_raw.primaries == ColorPrimaries.UNKNOWN:
        dst_raw = ColorSpace(primaries_guess(target.w, target.h),
                             dst_raw.transfer, dst_raw.hdr)
    src, dst = color_space_infer_map(frame.color, dst_raw)
    return (dataclasses.replace(frame, color=src),
            dataclasses.replace(target, color=dst))


def frames_infer_mix(mix, target: Target):
    """Mix-window variant (reference pl_frames_infer_mix,
    renderer.c:4027): infers the target against the mix's nearest
    frame and returns (target', ref_frame' or None)."""
    import dataclasses
    from .queue import frame_mix_nearest
    ref = frame_mix_nearest(mix)
    if ref is None:
        dst = target.color.infer(target.w, target.h)
        return dataclasses.replace(target, color=dst), None
    ref2, target2 = frames_infer(ref, target)
    return target2, ref2


def translate_srgb_color(rgb, csp: ColorSpace) -> np.ndarray:
    """Encode an sRGB color into colorspace `csp` (reference
    translate_srgb_color, renderer.c:2555): linearize as sRGB (re-using
    the target's own curve for the SDR gamma family to avoid small
    adaptations), convert primaries relative-colorimetrically, and
    delinearize with the target's transfer."""
    from ..core.colorspace import (COLOR_HDR_BLACK, CSP_SRGB, HdrMetadata,
                                   primaries_get)
    from ..ops import color as ops_color
    csp = csp.infer()
    if csp.transfer in (ColorTransfer.BT_1886, ColorTransfer.SRGB,
                        ColorTransfer.GAMMA22):
        srgb = ColorSpace(ColorPrimaries.BT_709, csp.transfer,
                          HdrMetadata(min_luma=csp.hdr.min_luma))
    else:
        srgb = ColorSpace(CSP_SRGB.primaries, CSP_SRGB.transfer,
                          HdrMetadata(min_luma=COLOR_HDR_BLACK))
    col = np.asarray(rgb, np.float32)[:3].reshape(3, 1, 1)
    lin = np.asarray(ops_color.linearize(jnp.asarray(col), srgb))
    m = color_mapping_matrix(primaries_get(srgb.primaries),
                             primaries_get(csp.primaries)).m
    lin = (m.astype(np.float64) @ lin.reshape(3, 1)).reshape(3, 1, 1)
    out = np.asarray(ops_color.delinearize(
        jnp.asarray(lin.astype(np.float32)), csp))
    return out.reshape(3)


def clear_target(target: Target, rgba=(0.0, 0.0, 0.0, 0.0)) -> jnp.ndarray:
    """Target-encoded solid fill (reference pl_frame_clear_rgba,
    renderer.c:4169): returns (C, h, w) data suitable for
    `Target.data` / direct output, with `rgba` interpreted as an sRGB
    color translated into the target's colorspace and repr."""
    from ..core.colorspace import AlphaMode, color_repr_decode
    comps = 4 if target.repr.alpha != AlphaMode.NONE else 3
    enc = translate_srgb_color(rgba, target.color)
    if target.repr.sys != ColorSystem.RGB:
        tr, _ = color_repr_decode(target.repr)
        minv = np.linalg.inv(tr.mat.m.astype(np.float64))
        enc = (minv @ (enc - tr.c)).astype(np.float32)
    a = float(rgba[3]) if len(rgba) > 3 else 1.0
    mult = a if target.repr.alpha == AlphaMode.PREMULTIPLIED else 1.0
    col = np.concatenate([mult * enc, [a]])[:comps].astype(np.float32)
    return jnp.broadcast_to(
        jnp.asarray(col)[:, None, None], (comps, target.h, target.w))


def clear_target_tiles(target: Target, tile_colors=((0.93, 0.93, 0.93),
                                                    (0.87, 0.87, 0.87)),
                       tile_size: int = 32) -> jnp.ndarray:
    """Target-encoded checkerboard fill (reference pl_frame_clear_tiles,
    renderer.c:4116): two sRGB tile colors translated into the target's
    colorspace, as (3, h, w) data."""
    encs = [translate_srgb_color(tuple(c) + (1.0,), target.color)
            for c in tile_colors]
    from ..core.colorspace import color_repr_decode
    if target.repr.sys != ColorSystem.RGB:
        tr, _ = color_repr_decode(target.repr)
        minv = np.linalg.inv(tr.mat.m.astype(np.float64))
        encs = [(minv @ (e - tr.c)).astype(np.float32) for e in encs]
    yy, xx = np.meshgrid(np.arange(target.h) // tile_size,
                         np.arange(target.w) // tile_size, indexing="ij")
    sel = ((yy + xx) % 2).astype(np.float32)
    c0 = np.asarray(encs[0], np.float32)[:, None, None]
    c1 = np.asarray(encs[1], np.float32)[:, None, None]
    return jnp.asarray(c0 * (1 - sel) + c1 * sel)


# ---------------------------------------------------------------------------
# Frame mixing (reference pl_render_image_mix, renderer.c:3612)
# ---------------------------------------------------------------------------

def _mix_weights(params: RenderParams, timestamps, vsync_duration: float):
    """Host-side mixing weights for the frame mixer kernel evaluated at
    the relative PTS offsets (reference: mix blend pass)."""
    cfg = _find_scaler(params.frame_mixer)
    ts = np.asarray(timestamps, dtype=np.float64)
    if cfg.name == "oversample":
        # SmoothMotion: weight by vsync coverage of the two neighbors
        w = np.zeros(len(ts))
        if len(ts) == 1:
            w[0] = 1.0
        else:
            # fraction of the vsync covered by the later frame
            later = np.argmax(ts > 0) if np.any(ts > 0) else len(ts) - 1
            t1 = ts[later]
            ratio = np.clip(0.5 - t1 / max(vsync_duration, 1e-9), 0.0, 1.0) \
                if vsync_duration else (1.0 if t1 <= 0 else 0.0)
            w[later] = 1.0 - ratio if t1 > 0 else 1.0
            if later > 0:
                w[later - 1] = 1.0 - w[later]
    else:
        radius = cfg.radius_bound()
        from ..core.filters import sample_filter
        w = sample_filter(cfg, np.abs(ts) / max(radius, 1e-9) * radius)
        w = np.where(np.abs(ts) <= radius, w, 0.0)
        if w.sum() <= 0:
            w = np.zeros(len(ts))
            w[np.argmin(np.abs(ts))] = 1.0
    s = w.sum()
    return (w / s).astype(np.float32)


def render_image_mix(renderer: Renderer, mix, target: Target,
                     params: Optional[RenderParams] = None) -> jnp.ndarray:
    """Blend a FrameMix window into the target (reference
    pl_render_image_mix): each source frame renders once into a cached
    intermediate keyed by its signature; the blend is a weighted sum."""
    params = params or DEFAULT_PARAMS
    if not hasattr(renderer, "_mix_cache"):
        renderer._mix_cache = {}

    # render each unique frame (no dither on intermediates)
    inter_target = Target(w=target.w, h=target.h, repr=target.repr,
                          color=target.color, bit_depth=0,
                          crop=target.crop)
    inter_params = replace(params, dither=None, error_diffusion=None)
    pkey = (inter_target.meta_key(), inter_params.key())
    if not params.preserve_mixing_cache:
        # reference semantics: cached mix intermediates become invalid
        # when the render parameters change (render_params_info,
        # renderer.c:3515); preserve_mixing_cache keeps them anyway
        stale = [k for k in renderer._mix_cache if k[1:] != pkey]
        for k in stale:
            renderer._mix_cache.pop(k)
    # reference skip_caching_single_frame: a lone frame in the mix is
    # being displayed directly (no interpolation) — don't pollute the
    # cache with it
    cache_ok = len(mix.frames) > 1 or not params.skip_caching_single_frame
    rendered = []
    for frame in mix.frames:
        key = (frame.signature or id(frame),) + pkey
        img = renderer._mix_cache.get(key)
        if img is None:
            img = renderer.render(frame, inter_target, inter_params)
            if cache_ok:
                renderer._mix_cache[key] = img
                # bound scales with the mix window so wide windows
                # (> 16 frames) can't thrash their own working set
                cap = max(16, 2 * len(mix.frames))
                while len(renderer._mix_cache) > cap:
                    renderer._mix_cache.pop(
                        next(iter(renderer._mix_cache)))
        rendered.append(img)

    w = _mix_weights(params, mix.timestamps, mix.vsync_duration)
    out = None
    for wi, img in zip(w, rendered):
        if wi == 0.0:
            continue
        term = img * float(wi)
        out = term if out is None else out + term
    if out is None:
        out = rendered[0]

    # final dither to target depth
    if target.bit_depth and params.dither is not None:
        out = ops_dither.dither(out, target.bit_depth, params.dither)
    return jnp.clip(out, 0.0, 1.0)
