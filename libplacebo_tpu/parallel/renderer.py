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

Halo-pipeline coverage: the flagship path — planar
or packed input (alpha planes included), chroma merge, linear/sigmoid
scaling, separable or polar scalers with anti-ringing, peak detect, any
tone/gamut mapping, contrast recovery (halo'd feature-map resizes),
deband (ring-wrap halos + shared RNG tables), AV1 + H.274 film grain
(traced global block offsets / PCG macroblock coordinates), temporal
deinterlacing (reflect halos + global row parity), Dolby Vision
reshaping, custom LUTs, frame/target ICC profiles, cone distortion,
color adjustment, dither, target blending against existing contents
(pointwise on the local row block, `run(..., target_data=)` batched and
row-sharded), overlays (per-shard row-intersection blend of
the replicated resized overlay), and target sub-rect composites with
background fill + corner rounding (a GSPMD outer stage: the image-row
and target-row partitions differ, XLA inserts the resharding
collectives).  180-degree rotation shards as a local flip + ring-order
reversal.  90/270 rotation (transposes the sharded axis), user hooks
(arbitrary stencils) and error diffusion (a whole-frame serial scan —
ONE pass in the reference too, dithering.c:326) run through
`_build_gspmd_step` instead: the single-chip trace vmapped + jit'd with
sharding constraints, XLA's SPMD partitioner inserting the
all-to-all / halo / gather collectives.  Geometry the halo pipeline
cannot express (row counts not divisible by the mesh, halos exceeding
the local block, partial row crops) also falls back to the GSPMD step
(logged), so every renderable config is executable multi-chip.
"""
from __future__ import annotations

import math
import warnings
from dataclasses import replace
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
           "sharded_render_mix", "extend_rows"]


# ---------------------------------------------------------------------------
# Halo exchange (parallel.halo: edge/reflect/wrap modes)
# ---------------------------------------------------------------------------

from .halo import extend_rows  # noqa: E402  (re-export; historic home)


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
    'spatial'.  Planes whose row count is not divisible by the mesh
    (only reachable through the GSPMD fallback, which reshards inside
    the jit anyway) are placed batch-sharded only — device_put cannot
    split an indivisible axis."""
    n_sp = int(mesh.shape["spatial"])
    out = []
    for p in planes:
        p = jnp.asarray(p)
        spec = P("data", None, "spatial", None) \
            if p.shape[-2] % n_sp == 0 else P("data")
        out.append(jax.device_put(p, NamedSharding(mesh, spec)))
    return tuple(out)


def sharded_state_init(mesh: Mesh, batch: int):
    """Per-frame peak-detect state (B, 2), B over 'data'."""
    sh = NamedSharding(mesh, P("data", None))
    return jax.device_put(jnp.zeros((batch, 2), jnp.float32), sh)


def _check(cond, msg):
    if not cond:
        raise RenderError(f"sharded pipeline: {msg}")


class _HaloUnsupported(Exception):
    """The hand-written halo pipeline cannot express this config (row
    counts not divisible by the mesh, halos exceeding the local block,
    partial row crops, ...); the caller falls back to the GSPMD step."""


def _require(cond, msg):
    if not cond:
        raise _HaloUnsupported(msg)


def build_sharded_pipeline(mesh: Mesh, plane_metas,
                           frame_repr: ColorRepr, frame_color: ColorSpace,
                           target: Target,
                           params: Optional[RenderParams] = None,
                           crop: Optional[RectF] = None,
                           frame_grain=None, field=None, first_field=None,
                           frame_icc=None, has_temporal: bool = False,
                           overlays=(), rotation: int = 0):
    """Build the jitted multi-chip render step for one frame signature.

    plane_metas: ((shape, component_mapping, shift_x, shift_y), ...) —
    exactly `Frame.meta_key()[0]` with *global* plane shapes (C, ph, pw).

    Returns `step(state, *planes, grain_tables=None, dovi_packed=None,
    prev_planes=None, next_planes=None, target_data=None)
    -> (out, new_state)` where each
    plane is (B, C, ph, pw) sharded (B over 'data', rows over 'spatial'),
    `state` is (B, 2), and `out` is (B, C_out, target.h, target.w) with
    the same sharding.  Per batch element the output equals the
    single-chip `Renderer.render` of that frame.

    Configs the hand-written halo pipeline cannot express — features
    with arbitrary communication (error diffusion, distortion,
    blur/skip borders, resizing/position-dependent hooks) as well as
    geometry it does not handle (row counts not divisible by the mesh,
    halos exceeding the local block, partial row crops) — fall back to
    the GSPMD auto-partitioned step (logged), so every renderable
    config is executable multi-chip.  Bounded-stencil mpv hooks (proven
    by probe + shard-equivariance check, see `parallel.hook_halo`) and
    90/270 rotations with an explicit rotated-space crop ride the halo
    pipeline with O(halo) / O(frame/n) collective bytes.

    The step is stateless across frames; temporal dither (dp.temporal)
    therefore runs at a fixed phase 0 here — matching the single-chip
    renderer's first frame (the per-frame phase cycle needs the
    Renderer's frame counter).

    grain_tables: per-frame AV1 tables (ops.film_grain.prepare_av1_grain
    per plane, stacked over the batch dim) when the frame carries grain.
    dovi_packed: ops.dovi.pack_dovi coefficients, batched.
    prev/next_planes: neighbor-frame planes (sharded like planes) for
    the temporal deinterlacers.
    target_data: existing target contents (B, C_t, target.h, target.w),
    sharded like the output, blended per params.blend (the reference's
    pl_blend_params hardware blending on the final pass).
    """
    from ..core.log import default_log
    from ..render.renderer import DEFAULT_PARAMS
    params = params or DEFAULT_PARAMS

    # ---- features the hand-tuned halo pipeline cannot express run
    # under GSPMD auto-partitioning instead (same trace as single-chip;
    # XLA inserts the collectives).  Hooked 90/270 rotations also go
    # GSPMD: the hook probe/plan runs in ONE geometry, not both sides
    # of the rotation.
    border_mode = "skip" if params.skip_target_clearing else \
        (params.border or params.background)
    gspmd_args = (mesh, plane_metas, frame_repr, frame_color, target,
                  params, crop, frame_grain, field, first_field,
                  frame_icc, has_temporal, overlays, rotation)
    if params.error_diffusion is not None or \
            params.distort is not None or \
            border_mode in ("blur", "skip") or \
            params.visualize_lut or \
            (rotation % 4 in (1, 3) and params.hooks):
        # visualize_lut draws the tone/gamut debug view at GLOBAL
        # frame coordinates (visualize_rect fractions of the full
        # output); a row shard running color_map_stage locally would
        # draw its own copy per shard — same class as the fused-tail
        # exclusion in render/renderer.py
        return _build_gspmd_step(*gspmd_args)
    # user hooks: bounded-stencil shader hooks (probed + verified, see
    # parallel.hook_halo) run ON the halo pipeline with O(halo)
    # ppermute bytes; anything unprovable falls back to GSPMD
    hook_plan = None
    if params.hooks:
        from .hook_halo import plan_halo_hooks
        from ..render.renderer import Renderer
        ref_i_h = Renderer._ref_plane_index(plane_metas)
        H_h = plane_metas[ref_i_h][0][-2]
        W_h = plane_metas[ref_i_h][0][-1]
        dc = target.crop or RectF(0, 0, target.w, target.h)
        hook_plan = plan_halo_hooks(
            params, plane_metas, frame_repr.sys, H_h, W_h,
            int(round(dc.w)), int(round(dc.h)), int(mesh.shape["spatial"]))
        if hook_plan is None:
            return _build_gspmd_step(*gspmd_args)
        default_log().info(
            "sharded renderer: hooks proven bounded-stencil "
            "(probe + equivariance) -> halo pipeline, footprints "
            + str({k.name: v["F"] for k, v in hook_plan.items()
                   if k != "__sizes__"}))
    try:
        return _build_halo_step(*gspmd_args, hook_plan=hook_plan)
    except _HaloUnsupported as e:
        default_log().info(
            f"sharded renderer: {e} -> GSPMD auto-partitioned step "
            "(XLA-inserted collectives), not the halo pipeline")
        return _build_gspmd_step(*gspmd_args)


def _build_halo_step(mesh: Mesh, plane_metas,
                     frame_repr: ColorRepr, frame_color: ColorSpace,
                     target: Target, params, crop, frame_grain, field,
                     first_field, frame_icc, has_temporal, overlays,
                     rotation, hook_plan=None):
    """The hand-written halo pipeline (see build_sharded_pipeline);
    raises _HaloUnsupported for geometry it cannot express."""
    from ..render.hooks import HookStage, run_hooks
    from ..render.renderer import Renderer
    n_sp = int(mesh.shape["spatial"])
    axis = "spatial"
    blend_on = params.blend is not None

    # ---- bounded-stencil user hooks (parallel.hook_halo plan): run the
    # hook body on the halo-extended local block and crop — identical
    # values by the plan's proven shard-equivariance
    hook_sizes = (hook_plan or {}).get("__sizes__", {})
    dst_crop_h = target.crop or RectF(0, 0, target.w, target.h)

    # cross-frame hook state (r5): per-pixel STORAGE textures shard
    # with the rows; uniform STORAGE buffer vars carry replicated —
    # the plan proved both shard-equivariant.  The current per-frame
    # values live in `_hs_ctx["cur"]`, set by frame_step at trace time
    # (the single-chip hstates-dict pattern, renderer.py pipeline()).
    hook_state_specs = tuple(
        (h, tuple(sorted(getattr(h, "state_spec", None) or ())))
        for h in (params.hooks or ())
        if getattr(h, "state_spec", None))
    # "cur" holds the FRAME-INITIAL values (read by every invocation —
    # single-chip run_hooks hands each same-frame invocation the same
    # frame-initial state_in dict); "out" accumulates deposited values
    # last-write-wins, harvested at frame end like the single-chip
    # sout dict.  Chaining cur between invocations would diverge from
    # single-chip whenever a stage fires more than once per frame
    # (e.g. CHROMA_INPUT over separate U and V planes).
    _hs_ctx: dict = {"cur": None, "out": None}

    def hooks_at(stage, x):
        ent = (hook_plan or {}).get(stage)
        if not ent:
            return x
        F = ent["F"]
        rows_l = x.shape[-2]
        ext = extend_rows(x, F, n_sp, axis) if F else x
        cur = _hs_ctx["cur"]
        states = None
        stage_stateful = ()
        if cur is not None:
            stage_stateful = tuple(
                (h, names) for h, names in hook_state_specs
                if h in ent["hooks"])
        if stage_stateful:
            states = {}
            for h, names in stage_stateful:
                sin = {}
                for n in names:
                    v = cur[(h.signature, n)]
                    if n.startswith("tex:") and F:
                        v = extend_rows(v, F, n_sp, axis)
                    sin[n] = v
                states[h.signature] = (sin, {})
        out = run_hooks(ent["hooks"], stage, ext, None, states=states,
                        dst_w=int(round(dst_crop_h.w)),
                        dst_h=int(round(dst_crop_h.h)),
                        size_override=hook_sizes.get(stage))
        if states:
            out_d = _hs_ctx["out"]
            for h, names in stage_stateful:
                sin, sout = states[h.signature]
                for n in names:
                    if n not in sout:
                        continue        # not written at this stage:
                                        # frame-initial value stands
                    v = sout[n]
                    if n.startswith("tex:") and F:
                        v = v[..., F:F + rows_l, :]
                    out_d[(h.signature, n)] = v
        if out.shape[-2] != ext.shape[-2]:
            raise RenderError(
                "halo-planned hook changed the row count at execution "
                "time (plan violated)")
        return out[..., F:F + rows_l, :] if F else out

    # ---- target sub-rect / corner rounding: composited OUTSIDE the
    # shard_map under plain GSPMD — the image rows and target rows live
    # on different row partitions, and XLA inserts the resharding
    # collectives for the dynamic_update_slice automatically (the
    # TPU-native answer to the reference's clear_target + blit,
    # renderer.c:2491).  Dither and overlays then follow single-chip
    # order (composite -> corner -> dither -> overlays).
    dst_crop_t = target.crop or RectF(0, 0, target.w, target.h)
    x0_t = int(round(dst_crop_t.x0))
    y0_t = int(round(dst_crop_t.y0))
    needs_composite = (int(round(dst_crop_t.w)), int(round(dst_crop_t.h)),
                       x0_t, y0_t) != (target.w, target.h, 0, 0)
    needs_outer = needs_composite or params.corner_rounding > 0
    if needs_outer:
        _require(target.h % n_sp == 0,
               f"target rows {target.h} % {n_sp} != 0")

    # ---- overlay plans (reference draw_overlays, renderer.c:811):
    # static rects; each shard blends the rows that intersect its block,
    # slicing a row-padded copy of the (replicated, tiny) resized overlay
    _require(not (getattr(target, "overlays", ()) or ()),
             "target overlays need the GSPMD fallback")
    ov_specs = []
    for ov in (() if needs_outer else overlays):
        # only the legacy whole-texture-at-target-rect shorthand runs in
        # the halo pipeline; parts/monochrome/coords/color-converted
        # overlays fall back to the GSPMD step (which reuses the
        # single-chip trace and so inherits the full semantics)
        _require(Renderer.overlay_is_simple(ov),
                 "overlay with parts/mode/coords/encoding needs the "
                 "GSPMD fallback")
        r = ov.rect
        ow = max(1, int(round(r.x1 - r.x0)))
        oh = max(1, int(round(r.y1 - r.y0)))
        x0, y0 = int(round(r.x0)), int(round(r.y0))
        _check(0 <= x0 and x0 + ow <= target.w,
               "overlay x range outside the target")
        ov_specs.append((x0, y0, oh, ow))

    # identical joint inference to the single-chip renderer
    # (pl_color_space_infer_map) so sharded output stays bit-equal
    from ..core.colorspace import (ColorPrimaries, color_space_infer_map,
                                   primaries_guess)
    dst_raw = target.color
    if dst_raw.primaries == ColorPrimaries.UNKNOWN:
        dst_raw = ColorSpace(primaries_guess(target.w, target.h),
                             dst_raw.transfer, dst_raw.hdr)
    src_color, dst_color = color_space_infer_map(frame_color, dst_raw)

    ref_i = Renderer._ref_plane_index(plane_metas)
    H, W = plane_metas[ref_i][0][-2], plane_metas[ref_i][0][-1]
    # 90/270 rotation: per-plane work happens pre-rotation on source
    # rows; the decoded image then rotates via ONE all-to-all (a local
    # rot90 leaves each shard holding a column slab of the rotated
    # image — redistributing slabs to rows is exactly lax.all_to_all).
    # Everything downstream sees the rotated (H_r, W_r) geometry.
    rot = rotation % 4
    if rot in (1, 3):
        _require(W % n_sp == 0,
                 f"rotated rows (src cols) {W} % {n_sp} != 0")
        H_r, W_r = W, H
    else:
        H_r, W_r = H, W
    # same default as Renderer.get_crop (UNROTATED frame dims — for
    # rotated frames callers pass the rotated-space crop explicitly;
    # a mismatched default routes to GSPMD via the check below, which
    # reproduces the single-chip clamp-stretch semantics exactly)
    crop = crop or RectF(0, 0, W, H)
    _require(crop.y0 == 0 and crop.y1 == H_r,
           "row crop must span the full frame (rows are the sharded axis)")
    dst_w = int(round(dst_crop_t.w))
    dst_h = int(round(dst_crop_t.h))
    _require(H % n_sp == 0, f"src rows {H} % {n_sp} != 0")
    _require(dst_h % n_sp == 0, f"dst rows {dst_h} % {n_sp} != 0")
    H_l, dst_l = H // n_sp, dst_h // n_sp
    H_rl = H_r // n_sp

    # ---- chroma-merge plans (mirrors Renderer._merge_planes:
    # direction-aware plane scalers, None inherits the main scalers)
    merge_up = _find_scaler(params.plane_upscaler or params.upscaler)
    merge_down = _find_scaler(params.plane_downscaler or params.downscaler)
    merge_plans = []
    for shape, mapping, sx, sy in plane_metas:
        ph, pw = shape[-2], shape[-1]
        _require(ph % n_sp == 0, f"plane rows {ph} % {n_sp} != 0")
        if (ph, pw) == (H, W) and (sx or sy) and \
                not params.correct_subpixel_offsets:
            merge_plans.append(None)     # subpixel snap (single-chip parity)
        elif (ph, pw) != (H, W) or sx or sy:
            merge_cfg = merge_down if (ph > H or pw > W) else merge_up
            _require(not merge_cfg.polar,
                     "polar plane-merge scaler needs the GSPMD fallback")
            s0x = -sx * pw / W
            s0y = -sy * ph / H
            halo_m = _halo_ortho(merge_cfg, ph, H, s0y, s0y + ph, n_sp)
            _require(halo_m <= ph // n_sp,
                   f"merge halo {halo_m} exceeds local rows {ph // n_sp}")
            rect_l = RectF(s0x, s0y + halo_m, s0x + pw, s0y + halo_m +
                           ph // n_sp)
            merge_plans.append((halo_m, rect_l, merge_cfg))
        else:
            merge_plans.append(None)

    # ---- per-plane feature plans (deinterlace / deband / AV1 grain)
    from ..ops import deband as ops_deband
    from ..ops import film_grain as ops_fg

    di_on = params.deinterlace is not None and field is not None
    if di_on:
        for shape, _m, _sx, _sy in plane_metas:
            _require(shape[-2] // n_sp >= 4,
                   "deinterlace halo (4 rows) exceeds local rows")

    deband_tabs = None
    if params.deband is not None:
        deband_tabs = []
        for i, (shape, mapping, sx, sy) in enumerate(plane_metas):
            if 3 in mapping:
                deband_tabs.append(None)
                continue
            pl_rows = shape[-2] // n_sp
            halo_db = ops_deband.deband_halo(params.deband, i)
            _require(halo_db <= pl_rows,
                   f"deband halo {halo_db} exceeds local rows {pl_rows}")
            # full-frame random tables, baked as constants; each shard
            # slices its rows so every pixel sees the single-chip draw
            deband_tabs.append(ops_deband.deband_rng_tables(
                params.deband, shape, i))

    grain_cfgs = None
    scaling_shift = 8
    h274_grain = None
    if params.film_grain and frame_grain is not None:
        if frame_grain.type == "av1":
            grain_cfgs, scaling_shift = Renderer._grain_cfgs(
                Renderer(), plane_metas, frame_repr, frame_grain)
            if grain_cfgs is not None:
                for (shape, mapping, sx, sy), cfg_g in zip(plane_metas,
                                                           grain_cfgs):
                    if cfg_g is None:
                        continue
                    _require(H_l % (1 << cfg_g.sub_y) == 0,
                           "luma local rows must align with chroma "
                           "subsampling for grain scaling")
        elif frame_grain.type == "h274":
            from ..ops import film_grain_h274 as ops_h274
            if ops_h274.needs_fg_h274(frame_grain):
                h274_grain = frame_grain
                for shape, _m, _sx, _sy in plane_metas:
                    _require(shape[-2] // n_sp % 8 == 0,
                           "H.274 grain: local rows must be a multiple "
                           "of the 8-row block")

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
            halo_s = _halo_polar(cfg_s, H_r, W_r, dst_h, dst_w, crop, n_sp)
        else:
            sy_ax = src_h_c / dst_h
            cfg_v = down if (down is not None and sy_ax > 1.0) else cfg_s
            halo_s = _halo_ortho(cfg_v, H_r, dst_h, crop.y0, crop.y1, n_sp)
        _require(halo_s <= H_rl,
               f"scaler halo {halo_s} exceeds local rows {H_rl}")
        rect_s = RectF(crop.x0, halo_s, crop.x1, halo_s + H_rl)
    else:
        _require(dst_h == H_r, "pass-through requires matching row counts")
        cfg_s = down = None
        halo_s = 0
        rect_s = None

    use_linear = (params.linear_scaling and needs_scale
                  and not params.disable_linear_scaling)
    use_sigmoid = (use_linear and params.sigmoid is not None
                   and not src_color.is_hdr())
    # same ICC forcing as the single-chip renderer: a profile replaces
    # the nominal transfer, so the conversion pass must run even between
    # nominally-equal colorspaces (renderer.c:2271)
    need_color_map = (src_color.primaries != dst_color.primaries or
                      src_color.transfer != dst_color.transfer or
                      target.icc is not None or
                      frame_icc is not None)
    from ..ops.tone_dynamic import DYNAMIC_TONE_FUNCTIONS
    _tm_fn = params.tone_mapping_function
    use_peak = (params.peak_detect is not None and src_color.is_hdr()
                and need_color_map
                and _tm_fn in DYNAMIC_TONE_FUNCTIONS
                and not (_tm_fn == "st2094-40"
                         and src_color.hdr.ootf is not None))
    if use_peak and dst_l % 16 != 0:
        warnings.warn(
            f"sharded peak detect: local rows {dst_l} not a multiple of "
            "the 16-row stat tile; the frame average uses shard-local "
            "tiles (tiny deviation from single-chip)")

    # ---- contrast-recovery plan: the low-pass feature map's 4x bilinear
    # down + bicubic up need their own halos (reference renderer.c:2089)
    recovery_impl = None
    if params.contrast_recovery > 0 and need_color_map \
            and params.contrast_smoothness > 1:
        lh = max(1, int(math.ceil(dst_h / params.contrast_smoothness)))
        lw = max(1, int(math.ceil(dst_w / params.contrast_smoothness)))
        _require(lh % n_sp == 0,
               f"contrast recovery: feature rows {lh} % {n_sp} != 0 "
               "(pick a contrast_smoothness dividing the row count)")
        lh_l = lh // n_sp
        cfg_bil = _find_scaler("bilinear")
        cfg_bic = _find_scaler("bicubic")
        halo_dn = _halo_ortho(cfg_bil, dst_h, lh, 0.0, dst_h, n_sp)
        halo_up = _halo_ortho(cfg_bic, lh, dst_h, 0.0, lh, n_sp)
        _require(halo_dn <= dst_l and halo_up <= lh_l,
               "contrast recovery halo exceeds local rows")

        def recovery_impl(x, base, cr, out_min, out_max):
            if cr <= 0:
                return base(x)
            ext = extend_rows(x, halo_dn, n_sp, axis)
            low = ops_sampling.resize_separable(
                ext, lh_l, lw, cfg_bil,
                RectF(0, halo_dn, dst_w, halo_dn + dst_l))
            exl = extend_rows(low, halo_up, n_sp, axis)
            lowres = ops_sampling.resize_separable(
                exl, dst_l, dst_w, cfg_bic,
                RectF(0, halo_up, lw, halo_up + lh_l))
            b = base(x)
            sharp = base(lowres) + (x - lowres)
            return jnp.clip(b + (sharp - b) * cr, out_min, out_max)

    # ---- dither bias: the frame-global pattern, rows sharded
    # (with an outer composite stage the dither runs there instead,
    # over the full target like the single-chip path)
    bias_np = None
    dither_on = target.bit_depth and params.dither is not None and \
        (target.bit_depth < 16 or params.force_dither)
    if dither_on and not needs_outer:
        dp = replace(params.dither, transfer=dst_color.transfer) \
            if params.dither.transfer == ColorTransfer.UNKNOWN \
            else params.dither
        if params.disable_dither_gamma_correction:
            dp = replace(dp, transfer=ColorTransfer.LINEAR)
        bias_np = ops_dither._bias_matrix(dp, dst_h, dst_w)
    else:
        dp = None

    from ..core.colorspace import AlphaMode, primaries_get

    def linearize_src(x):
        if frame_icc is not None:
            from ..ops import icc as ops_icc
            return ops_icc.decode_profile(
                x, frame_icc, primaries_get(src_color.primaries),
                **ops_icc.params_kwargs(params))
        return ops_color.linearize(x, src_color)

    def frame_step(state, bias_l, grain_tables, dovi_packed,
                   prev_planes, next_planes, overlay_datas, tgt_data,
                   hook_states, *planes):
        me = jax.lax.axis_index(axis)
        if hook_state_specs:
            cur = {}
            hs_i = 0
            for h, names in hook_state_specs:
                for n in names:
                    cur[(h.signature, n)] = hook_states[hs_i]
                    hs_i += 1
            _hs_ctx["cur"] = cur
            _hs_ctx["out"] = {}
        else:
            _hs_ctx["cur"] = None
            _hs_ctx["out"] = None
        # ---- pass_read_image: per-plane features, then merge on the
        # local row block (mirrors Renderer._merge_planes)
        luma_full = None
        if 0 in plane_metas[ref_i][1]:
            luma_full = planes[ref_i][
                ..., plane_metas[ref_i][1].index(0), :, :]

        channels = {}
        for i, ((shape, mapping, sx, sy), plan, data) in enumerate(zip(
                plane_metas, merge_plans, planes)):
            pl_rows = shape[-2] // n_sp
            row0 = me * pl_rows
            if di_on:
                from ..ops import deinterlace as ops_di
                ext = extend_rows(data, 4, n_sp, axis, mode="reflect")
                pe = extend_rows(prev_planes[i], 4, n_sp, axis,
                                 mode="reflect") if prev_planes else None
                ne = extend_rows(next_planes[i], 4, n_sp, axis,
                                 mode="reflect") if next_planes else None
                ext = ops_di.deinterlace(
                    ext, field, params.deinterlace, prev=pe, next=ne,
                    first_field=first_field or field,
                    row_offset=row0 - 4)
                data = ext[..., 4:4 + pl_rows, :]
            if deband_tabs is not None and deband_tabs[i] is not None:
                chs, nz = deband_tabs[i]
                chs_l = [jax.lax.dynamic_slice_in_dim(c, row0, pl_rows,
                                                      axis=0)
                         for c in chs]
                nz_l = None if nz is None else \
                    jax.lax.dynamic_slice_in_dim(nz, row0, pl_rows,
                                                 axis=-2)
                # same per-plane neutral + HDR grain rescale as the
                # single-chip path (renderer.c:1318-1342,1716-1761)
                dbp = params.deband
                if src_color.hdr.max_luma > 0:
                    from dataclasses import replace as _replace
                    from ..core.colorspace import COLOR_SDR_WHITE
                    dbp = _replace(dbp, grain=dbp.grain /
                                  (src_color.hdr.max_luma /
                                   COLOR_SDR_WHITE))
                data = ops_deband.deband(
                    data, dbp, seed=i,
                    tables=(chs_l, nz_l), shard=(axis, n_sp),
                    neutral=ops_deband.plane_grain_neutral(frame_repr,
                                                           mapping))
            if h274_grain is not None and 3 not in mapping:
                from ..core.colorspace import system_is_ycbcr_like
                from ..ops import film_grain_h274 as ops_h274
                data = ops_h274.apply_h274_grain(
                    data, h274_grain, tuple(mapping),
                    is_ycbcr=system_is_ycbcr_like(frame_repr.sys),
                    row0=row0)
            if grain_cfgs is not None and grain_cfgs[i] is not None:
                cfg_g = grain_cfgs[i]
                luma = None
                if 0 not in mapping and luma_full is not None:
                    # MXU column-select subsample (lane-dim strided
                    # slices cost ~5 ms/frame; see subsample_nearest)
                    luma = ops_fg.subsample_nearest(
                        luma_full, cfg_g.sub_x, cfg_g.sub_y,
                        pl_rows, shape[-1])
                data = ops_fg.apply_av1_grain(
                    data, grain_tables[i], cfg_g, scaling_shift,
                    luma=luma, row0=row0)
            stage_in, stage_scaled = Renderer._plane_hook_stage(
                mapping, frame_repr.sys)
            if stage_in is not None:
                data = hooks_at(stage_in, data)
            if plan is not None:
                halo_m, rect_l, plan_cfg = plan
                ext = extend_rows(data, halo_m, n_sp, axis)
                data = ops_sampling.resize_separable(
                    ext, H_l, W, plan_cfg, rect_l,
                    antiring=params.antiringing_strength
                    or plan_cfg.antiring)
                if stage_scaled is not None:
                    data = hooks_at(stage_scaled, data)
            for ci, ch in enumerate(mapping):
                channels[ch] = data[..., ci, :, :]
        order = sorted(channels)
        img = jnp.stack([channels[c] for c in order], axis=-3)
        has_alpha = 3 in order
        alpha = None
        if has_alpha:
            alpha = img[..., -1:, :, :]
            img = img[..., :3, :, :]
            if frame_repr.alpha == AlphaMode.PREMULTIPLIED:
                img = img / jnp.maximum(alpha, 1e-6)
        img = hooks_at(HookStage.NATIVE, img)
        img = ops_color.decode_color(img, frame_repr, src_color.primaries,
                                     dovi_packed=dovi_packed,
                                     adjustment=params.color_adjustment)
        if rot == 2:
            # 180 degrees: local flip of both axes + reversing the shard
            # order over the ring (the row reversal crosses shards)
            def _rot180(a):
                a = a[..., ::-1, ::-1]
                if n_sp > 1:
                    a = jax.lax.ppermute(
                        a, axis, [(i, n_sp - 1 - i) for i in range(n_sp)])
                return a
            img = _rot180(img)
            if has_alpha:
                alpha = _rot180(alpha)
        elif rot in (1, 3):
            # 90/270: local rot90 of the (C, H_l, W) block yields the
            # shard's COLUMN slab of the rotated image (for k=1, shard
            # k's slab = rotated columns [k*H_l, (k+1)*H_l); for k=3 the
            # slab order reverses); ONE tiled all_to_all redistributes
            # slabs to row sharding — frame/n bytes per device, the ICI
            # relayout the r3 GSPMD leg paid a 2x-frame all-reduce for
            def _rot90_shard(a):
                a = jnp.rot90(a, k=rot, axes=(-2, -1))   # (C, W, H_l)
                if n_sp == 1:
                    return a
                if rot == 3:
                    a = jax.lax.ppermute(
                        a, axis, [(i, n_sp - 1 - i) for i in range(n_sp)])
                return jax.lax.all_to_all(
                    a, axis, split_axis=a.ndim - 2,
                    concat_axis=a.ndim - 1, tiled=True)
            img = _rot90_shard(img)
            if has_alpha:
                alpha = _rot90_shard(alpha)
        img = hooks_at(HookStage.RGB, img)
        if params.lut is not None and params.lut_type == "native":
            from ..ops import lut as ops_lut
            img = ops_lut.apply_lut(img, params.lut)

        # ---- pass_scale_main
        if use_linear:
            img = linearize_src(img)
            img = hooks_at(HookStage.LINEAR, img)
            if use_sigmoid:
                sig = SigmoidParams(*params.sigmoid)
                img = ops_color.sigmoidize(img, sig)
                img = hooks_at(HookStage.SIGMOID, img)
        img = hooks_at(HookStage.PRE_KERNEL, img)
        if needs_scale:
            ext = extend_rows(img, halo_s, n_sp, axis)
            if cfg_s.polar:
                img = ops_polar.sample_polar(
                    ext, cfg_s, dst_l, dst_w, rect_s,
                    antiring=params.antiringing_strength or cfg_s.antiring)
            else:
                img = ops_sampling.resize_separable(
                    ext, dst_l, dst_w, cfg_s, rect_s, cfg_down=down,
                    antiring=params.antiringing_strength
                    or cfg_s.antiring)
            if has_alpha:
                exta = extend_rows(alpha, halo_s, n_sp, axis)
                if cfg_s.polar:
                    alpha = ops_polar.sample_polar(
                        exta, cfg_s, dst_l, dst_w, rect_s)
                else:
                    alpha = ops_sampling.resize_separable(
                        exta, dst_l, dst_w, cfg_s, rect_s, cfg_down=down)
        img = hooks_at(HookStage.POST_KERNEL, img)
        if use_sigmoid:
            img = ops_color.desigmoidize(img, sig)
        img = hooks_at(HookStage.SCALED, img)

        # ---- pass_convert_colors
        if params.cone is not None:
            img = ops_color.cone_distort(img, src_color, params.cone,
                                         already_linear=use_linear)
        new_state = state
        if need_color_map:
            if not use_linear:
                img = linearize_src(img)
            peak_stats = None
            if use_peak:
                from ..core.colorspace import HdrScaling, hdr_rescale
                avg_pq, max_pq, new_state = ops_peak.applied_stats(
                    img, state, params.peak_detect,
                    hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                                src_color.hdr.max_luma),
                    axis_name=axis)
                peak_stats = (avg_pq, max_pq)
            img = color_map_stage(img, src_color, dst_color, params,
                                  peak_stats,
                                  tone_recovery_impl=recovery_impl)
            if target.icc is not None:
                from ..ops import icc as ops_icc
                img = ops_icc.encode_profile(
                    img, target.icc, primaries_get(dst_color.primaries),
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

        # ---- pass_output_target
        img = hooks_at(HookStage.PRE_OUTPUT, img)
        if params.lut is not None and params.lut_type == "conversion":
            from ..ops import lut as ops_lut
            img = ops_lut.apply_lut(img, params.lut)
        img = ops_color.encode_color(img, target.repr, dst_color.primaries)
        img = hooks_at(HookStage.OUTPUT, img)
        if has_alpha:
            if target.repr.alpha == AlphaMode.PREMULTIPLIED:
                img = img * alpha
            img = jnp.concatenate([img, alpha], axis=-3)
        if bias_l is not None:
            img = ops_dither.dither(img, target.bit_depth, dp, bias=bias_l)

        # target blending against the existing target contents (local
        # row block; pointwise, so the shard_map needs no collective —
        # reference pl_blend_params hardware blending on the final pass)
        if tgt_data is not None:
            img = Renderer._blend_target(img, tgt_data, params.blend)

        # overlays blend after dithering like the reference's final
        # vertex pass (draw_overlays, renderer.c:811): each shard blends
        # the rows its block intersects, slicing a row-padded copy of
        # the (tiny, replicated) resized overlay with a traced offset
        if ov_specs:
            row0d = me * dst_l
            rows_g = row0d + jnp.arange(dst_l)
            for (x0, y0, oh, ow), ov_data in zip(ov_specs, overlay_datas):
                ov_img = ops_sampling.sample_bilinear(ov_data, oh, ow)
                rgb_o = ov_img[..., :3, :, :]
                a_o = ov_img[..., 3:4, :, :] if ov_img.shape[-3] > 3 \
                    else jnp.ones_like(rgb_o[..., :1, :, :])
                ov4 = jnp.concatenate([rgb_o, a_o], axis=-3)
                ov_p = jnp.pad(ov4, [(0, 0)] * (ov4.ndim - 2) +
                               [(dst_l, dst_l), (0, 0)])
                start = row0d - y0 + dst_l
                sl = jax.lax.dynamic_slice(
                    ov_p, (0, start, 0), (4, dst_l, ow))
                valid = ((rows_g >= y0) & (rows_g < y0 + oh)
                         ).astype(img.dtype)[:, None]
                a_l = sl[3:4] * valid
                rgb_l = sl[:3]
                region = jax.lax.dynamic_slice(
                    img, (0, 0, x0), (img.shape[-3], dst_l, ow))
                if img.shape[-3] > 3:
                    # src_alpha=ONE, dst_alpha=ONE_MINUS_SRC_ALPHA
                    # (reference blend_params, renderer.c:996-1001)
                    blended = jnp.concatenate(
                        [rgb_l * a_l + region[..., :3, :, :] * (1 - a_l),
                         a_l + region[..., 3:, :, :] * (1 - a_l)], axis=-3)
                else:
                    blended = rgb_l * a_l + region * (1 - a_l)
                img = jax.lax.dynamic_update_slice(img, blended, (0, 0, x0))
        hs_out = ()
        if hook_state_specs:
            cur = _hs_ctx["cur"]
            out_d = _hs_ctx["out"]
            hs_out = tuple(out_d.get((h.signature, n),
                                     cur[(h.signature, n)])
                           for h, names in hook_state_specs
                           for n in names)
        if needs_outer:
            # composite/corner/dither/overlays continue in the GSPMD
            # outer stage; the single clip happens there (single-chip
            # order: renderer.c pass_output_target tail)
            return img, new_state, hs_out
        return jnp.clip(img, 0.0, 1.0), new_state, hs_out

    spec_img = P("data", None, "spatial", None)

    # per-state shardings: per-pixel texture state rides the row
    # partition; uniform buffer state is only batch-sharded
    hs_specs = tuple(
        P("data", None, "spatial", None) if n.startswith("tex:")
        else P("data")
        for h, names in hook_state_specs for n in names)

    n_pl = len(plane_metas)

    def local_step(state_b, bias_l, grain_b, dovi_b, prev_b, next_b,
                   ov_b, tgt_b, hs_b, *planes_b):
        np_prev = n_pl if prev_b is not None else 0
        np_next = n_pl if next_b is not None else 0
        n_ov = len(ov_b) if ov_b is not None else 0
        n_tgt = 1 if tgt_b is not None else 0
        n_hs = len(hs_b) if hs_b is not None else 0

        def one(state, grain_t, dovi_p, *pl):
            prev = pl[n_pl:n_pl + np_prev] if prev_b is not None else None
            nxt = pl[n_pl + np_prev:n_pl + np_prev + np_next] \
                if next_b is not None else None
            base = n_pl + np_prev + np_next
            ovs = pl[base:base + n_ov]
            tgt = pl[base + n_ov] if tgt_b is not None else None
            hs = pl[base + n_ov + n_tgt:base + n_ov + n_tgt + n_hs]
            return frame_step(state, bias_l, grain_t, dovi_p, prev, nxt,
                              ovs, tgt, hs, *pl[:n_pl])
        extra = (tuple(prev_b) if prev_b is not None else ()) + \
            (tuple(next_b) if next_b is not None else ()) + \
            (tuple(ov_b) if ov_b is not None else ()) + \
            ((tgt_b,) if tgt_b is not None else ()) + \
            (tuple(hs_b) if hs_b is not None else ())
        return jax.vmap(one)(state_b, grain_b, dovi_b, *planes_b, *extra)
    in_specs = (P("data", None),                      # state
                P("spatial", None),                   # dither bias
                P("data"),                            # grain tables
                P("data"),                            # dovi coefficients
                spec_img, spec_img,                   # prev/next planes
                P("data"),                            # overlays
                spec_img,                             # target contents
                hs_specs) + \
        tuple(spec_img for _ in plane_metas)          # planes

    step_sharded = shard_map(
        local_step, mesh=mesh, in_specs=in_specs,
        out_specs=(spec_img, P("data", None), hs_specs),
        check_vma=False)

    bias_j = None if bias_np is None else jnp.asarray(bias_np)

    def _outer_stage(out_img, overlay_datas, target_data):
        """Composite into the target canvas + corner rounding + dither +
        overlays, as plain GSPMD ops: the image-row and target-row
        partitions differ, and XLA inserts the resharding collectives
        for the dynamic_update_slice (reference clear_target + blit,
        renderer.c:2491)."""
        C_out = out_img.shape[1]
        th, tw = target.h, target.w
        if needs_composite:
            canvas = jnp.asarray(Renderer._background(
                params, C_out, th, tw))
            comp = jnp.broadcast_to(
                canvas[None], (out_img.shape[0],) + canvas.shape)
            comp = jax.lax.dynamic_update_slice(
                comp, out_img, (0, 0, y0_t, x0_t))
        else:
            comp = out_img
        if params.corner_rounding > 0:
            r_px = params.corner_rounding * min(th, tw) / 2
            yy, xx = np.mgrid[0:th, 0:tw] + 0.5
            cx = np.clip(xx, r_px, tw - r_px)
            cy = np.clip(yy, r_px, th - r_px)
            d = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
            mask = jnp.asarray(
                np.clip(r_px + 0.5 - d, 0.0, 1.0).astype(np.float32))
            bg = jnp.asarray(Renderer._background(params, C_out, th, tw))
            comp = bg + (comp - bg) * mask
        if dither_on:
            dp2 = replace(params.dither, transfer=dst_color.transfer) \
                if params.dither.transfer == ColorTransfer.UNKNOWN \
                else params.dither
            if params.disable_dither_gamma_correction:
                dp2 = replace(dp2, transfer=ColorTransfer.LINEAR)
            comp = ops_dither.dither(comp, target.bit_depth, dp2)
        if target_data is not None:
            comp = Renderer._blend_target(comp, target_data, params.blend)
        for ov_i, ov in enumerate(overlays):
            comp = Renderer._blend_overlay(
                comp, overlay_datas[ov_i], ov, False, target, dst_color,
                params, crop, dst_crop_t, rotation, (H, W))
        comp = jnp.clip(comp, 0.0, 1.0)
        return jax.lax.with_sharding_constraint(
            comp, NamedSharding(mesh, P("data", None, "spatial", None)))

    @partial(jax.jit, static_argnames=())
    def _jit_step(state, grain_tables, dovi_packed, prev_planes,
                  next_planes, overlay_datas, target_data, hook_states,
                  *planes):
        out, new_state, hs_out = step_sharded(
            state, bias_j, grain_tables, dovi_packed,
            prev_planes, next_planes,
            () if needs_outer else overlay_datas,
            None if needs_outer else target_data, hook_states, *planes)
        if needs_outer:
            out = _outer_stage(out, overlay_datas, target_data)
        return out, new_state, hs_out

    def run(state, *planes, grain_tables=None, dovi_packed=None,
            prev_planes=None, next_planes=None, overlay_datas=None,
            target_data=None, hook_states=None):
        if grain_cfgs is not None and grain_tables is None:
            raise RenderError(
                "frame carries AV1 grain: pass grain_tables= (batched "
                "ops.film_grain.prepare_av1_grain per plane)")
        if grain_cfgs is None and grain_tables is not None:
            raise RenderError(
                "grain_tables passed but the pipeline was built without "
                "frame_grain= (grain would be silently skipped)")
        if di_on and has_temporal and (prev_planes is None or
                                       next_planes is None):
            raise RenderError("temporal deinterlace: pass prev/next planes")
        if overlays and (overlay_datas is None or
                         len(overlay_datas) != len(overlays)):
            raise RenderError(
                "pipeline was built with overlays: pass overlay_datas= "
                "(batched (B, 4, h, w) per overlay)")
        if target_data is not None and not blend_on:
            raise RenderError(
                "target_data passed but params.blend is None (the "
                "contents would be silently ignored)")
        if hook_state_specs and hook_states is None:
            # first frame: batched initial values from the specs
            b = planes[0].shape[0]
            hook_states = tuple(
                jnp.broadcast_to(jnp.asarray(h.state_spec[n])[None],
                                 (b,) + tuple(np.shape(h.state_spec[n])))
                for h, names in hook_state_specs for n in names)
        out, new_state, hs_out = _jit_step(
            state, grain_tables, dovi_packed, prev_planes,
            next_planes, overlay_datas, target_data,
            tuple(hook_states or ()), *planes)
        if hook_state_specs:
            # stateful hooks: callers thread hook_states like `state`
            return out, new_state, hs_out
        return out, new_state

    return run


# ---------------------------------------------------------------------------
# GSPMD fallback: user hooks / 90-270 rotation
# ---------------------------------------------------------------------------

def _build_gspmd_step(mesh: Mesh, plane_metas, frame_repr, frame_color,
                      target, params, crop, frame_grain, field,
                      first_field, frame_icc, has_temporal, overlays,
                      rotation):
    """Multi-chip step via GSPMD auto-partitioning of the *single-chip*
    trace (jit + sharding constraints; no shard_map).

    Used for the features whose communication pattern the hand-written
    halo pipeline cannot express statically: user hooks (arbitrary
    stencils/resizes inside the hook bodies) and 90/270 rotation (a
    transpose of the sharded row axis -> all-to-all).  XLA's SPMD
    partitioner derives the collectives from the sharding constraints —
    the TPU-native equivalent of the reference falling back from the
    tuned compute path to the generic one (e.g. sampling.c's fragment
    fallback below the compute cutoff).  Per-frame semantics are
    *identical* to Renderer.render by construction: it IS the same
    traced pipeline, vmapped over the batch.
    """
    from ..core.log import default_log
    from ..render.renderer import Renderer

    why = ("user hooks" if params.hooks else
           f"rotation {rotation % 4 * 90}" if rotation % 4 in (1, 3) else
           "distortion" if params.distort is not None else
           "error diffusion (whole-frame serial scan, replicated pass)"
           if params.error_diffusion is not None else
           "blur/skip border" if (params.border or params.background)
           in ("blur", "skip") or params.skip_target_clearing else
           "halo-unsupported geometry")
    default_log().info(
        f"sharded renderer: {why} -> GSPMD auto-partitioned step (XLA-"
        "inserted collectives), not the halo pipeline")

    ref_i = Renderer._ref_plane_index(plane_metas)
    H, W = plane_metas[ref_i][0][-2], plane_metas[ref_i][0][-1]
    crop = crop or RectF(0, 0, W, H)

    r = Renderer()
    shard_hints = None
    if params.error_diffusion is not None or params.distort is not None:
        # whole-frame-serial (ED) / global-gather (distortion) stages:
        # ONE explicit gather-to-replicated at the stage boundary; the
        # final output constraint re-shards with a local slice.  Without
        # this the partitioner re-gathers around every Pallas/gather op
        # inside the stage (measured 20x/32x one dst frame at r5 start;
        # test_ed_distort_gspmd_traffic_bounded pins the fixed bound)
        sh_rep = NamedSharding(mesh, P(None, None, None))
        shard_hints = {"replicate": lambda x:
                       jax.lax.with_sharding_constraint(x, sh_rep)}
    if params.error_diffusion is not None:
        # the ED stage additionally runs as a MANUAL (shard_map) region
        # with replicated specs: on TPU the Pallas wavefront is an
        # opaque custom call the partitioner replicates whole, but the
        # CPU emulation runs it in interpret mode (while + dynamic_slice)
        # whose innards the partitioner would otherwise shard and then
        # all-gather PER ITERATION (measured 12.6 MB x2 in the loop
        # body).  The manual region makes the CPU-measured collectives
        # structurally identical to the TPU lowering: one boundary
        # gather, nothing inside.  vmap(spmd_axis_name='data') extends
        # the replicated specs with batch='data'.
        rep3 = P(None, None, None)
        shard_hints["manual"] = lambda fn: shard_map(
            fn, mesh=mesh, in_specs=rep3, out_specs=rep3,
            check_vma=False)
    if rotation % 4 in (1, 3):
        # 90/270 transposes the sharded row axis: re-anchoring the
        # rotated image to row sharding makes the partitioner emit ONE
        # all-to-all (frame/n bytes per device) instead of a
        # 2x-frame-sized masked all-reduce
        sh_rows = NamedSharding(mesh, P(None, "spatial", None))
        shard_hints = dict(shard_hints or {})
        shard_hints["post_rotate"] = lambda x: \
            jax.lax.with_sharding_constraint(x, sh_rows)
    pipeline = r._trace_pipeline(
        (plane_metas,), target, params, frame_repr, frame_color, crop,
        frame_grain, field=field, first_field=first_field,
        has_prev=has_temporal, has_next=has_temporal,
        rotation=rotation,
        overlays=tuple((ov, False) for ov in overlays)
        + tuple((ov, True) for ov in (target.overlays or ())),
        frame_icc=frame_icc, shard_hints=shard_hints)

    sh_img = NamedSharding(mesh, P("data", None, "spatial", None))
    sh_state = NamedSharding(mesh, P("data", None))

    # cross-frame hook state (STORAGE textures/buffers): per-batch-lane,
    # like the peak state — the 'data' axis is frame-parallel and each
    # lane carries its own temporal state
    hook_specs = tuple(
        (h, tuple(sorted(getattr(h, "state_spec", None) or ())))
        for h in params.hooks if getattr(h, "state_spec", None))

    def _constrain(p):
        return jax.lax.with_sharding_constraint(p, sh_img)

    @jax.jit
    def _jit_step(state, grain_tables, dovi_packed, prev_planes,
                  next_planes, overlay_datas, target_data, hook_states,
                  *planes):
        state = jax.lax.with_sharding_constraint(state, sh_state)
        planes = tuple(_constrain(p) for p in planes)
        if prev_planes is not None:
            prev_planes = tuple(_constrain(p) for p in prev_planes)
        if next_planes is not None:
            next_planes = tuple(_constrain(p) for p in next_planes)
        temporal = (prev_planes, next_planes)
        if target_data is not None:
            temporal = temporal + (_constrain(target_data),)
        # spmd_axis_name extends the shard_hints constraints (applied
        # INSIDE the vmap on per-example values) with batch='data' —
        # without it the batch dim is left unconstrained and the
        # partitioner shards the ED interpreter's while-loop buffers
        # across it, paying a frame-sized all-gather per iteration
        out, new_state, hs_out = jax.vmap(
            pipeline, spmd_axis_name="data")(
            state, grain_tables, temporal, overlay_datas, dovi_packed,
            hook_states, *planes)
        return _constrain(out), \
            jax.lax.with_sharding_constraint(new_state, sh_state), hs_out

    def run(state, *planes, grain_tables=None, dovi_packed=None,
            prev_planes=None, next_planes=None, overlay_datas=None,
            target_data=None, hook_states=None):
        if overlays and (overlay_datas is None or
                         len(overlay_datas) != len(overlays)):
            raise RenderError(
                "pipeline was built with overlays: pass overlay_datas=")
        if target_data is not None and params.blend is None:
            raise RenderError(
                "target_data passed but params.blend is None (the "
                "contents would be silently ignored)")
        ov_all = tuple(overlay_datas or ())
        # target OSD overlays were baked into the trace: append their
        # (replicated) textures, broadcast over the frame batch
        tgt_ovs = tuple(getattr(target, "overlays", ()) or ())
        if tgt_ovs:
            b = planes[0].shape[0]
            ov_all = ov_all + tuple(
                jnp.broadcast_to(jnp.asarray(o.data)[None],
                                 (b,) + tuple(o.data.shape))
                for o in tgt_ovs)
        if hook_states is None:
            # first frame: batched initial values from the specs
            b = planes[0].shape[0]
            hook_states = tuple(
                jnp.broadcast_to(jnp.asarray(h.state_spec[n])[None],
                                 (b,) + tuple(h.state_spec[n].shape))
                for h, names in hook_specs for n in names)
        out, new_state, hs_out = _jit_step(
            state, grain_tables, dovi_packed, prev_planes,
            next_planes, ov_all, target_data, tuple(hook_states),
            *planes)
        if hook_specs:
            # stateful hooks: callers thread hook_states like `state`
            return out, new_state, hs_out
        return out, new_state

    return run


# ---------------------------------------------------------------------------
# Sharded frame mixing
# ---------------------------------------------------------------------------

def sharded_render_mix(mesh: Mesh, step, state, frame_planes,
                       timestamps, vsync_duration: float,
                       params=None, bit_depth: int = 0,
                       dither_bias=None, **step_kw):
    """Multi-chip pl_render_image_mix analog: run the sharded `step`
    (from build_sharded_pipeline, built with bit_depth=0 on the target
    so intermediates stay continuous) once per mix frame and blend with
    the single-chip mixer weights; the weighted sum and the final
    dither stay row-sharded — no gather (reference
    pl_render_image_mix, renderer.c:3612: per-frame renders into cached
    FBOs + one blend pass).

    frame_planes: list (one per mix frame) of sharded plane tuples.
    Returns (out, new_state) where `state` threads through the frames
    in timestamp order like successive playback.  Pipelines built with
    stateful hooks return (out, state, hook_states) from each step;
    the carried hook state threads through the mix frames the same way
    and is returned as a third element (pass the previous mix's value
    back in via step_kw["hook_states"]).
    """
    from ..render.renderer import DEFAULT_PARAMS, _mix_weights
    params = params or DEFAULT_PARAMS
    w = _mix_weights(params, timestamps, vsync_duration)
    out = None
    img0 = None
    hs = step_kw.pop("hook_states", None)
    stateful = False
    for wi, planes in zip(w, frame_planes):
        res = step(state, *planes, hook_states=hs, **step_kw)
        if len(res) == 3:
            img, state, hs = res
            stateful = True
        else:
            img, state = res
        if img0 is None:
            img0 = img
        if wi == 0.0:
            continue
        term = img * float(wi)
        out = term if out is None else out + term
    if out is None:
        # all weights zero: display the first frame directly (the
        # single-chip path reuses rendered[0] without re-rendering —
        # re-calling step here would advance the carried state twice)
        out = img0
    if bit_depth and params.dither is not None and \
            (bit_depth < 16 or params.force_dither):
        out = ops_dither.dither(out, bit_depth, params.dither,
                                bias=dither_bias)
    out = jnp.clip(out, 0.0, 1.0)
    if stateful:
        return out, state, hs
    return out, state
