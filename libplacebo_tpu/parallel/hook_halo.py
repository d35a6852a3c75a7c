"""Halo-pipeline eligibility analysis for mpv user hooks.

The GSPMD fallback runs hooks multi-chip by auto-partitioning the
single-chip trace, but XLA's partitioner ships frame-sized all-gathers
for hook stencils (MULTICHIP_PERF.json r3).  Hook tap radii are in
fact statically known — texOff constants and unrolled loop bounds —
so bounded-stencil hooks belong on the hand-written halo pipeline:
extend the local row block by the hook's footprint (`extend_rows`,
O(halo) ppermute bytes), run the SAME hook body on the extended block,
crop.  (Reference bar: hooks are ordinary passes inside the renderer,
renderer.c:1036 — no special communication at all on one GPU.)

Eligibility is PROVEN per (hook, stage), not assumed:

1. *Structural*: mpv shader hooks only (the GLSL interpreter is
   introspectable); every pass same-size (no WIDTH/HEIGHT), fragment
   (no COMPUTE — workgroup geometry shifts with the shard offset), no
   //!OFFSET (the halo path has no rect channel), no STORAGE buffers
   (atomicAdd is a frame-global reduction) and no cross-frame state.
2. *Probed*: the hook runs once under `jax.eval_shape` with
   `mpv_hooks.probe_recording` active — every access to an
   image-derived texture logs its row-index pattern, and any
   materialization of a sampling position into value arithmetic
   (position-dependent shading, which is NOT shard-shift invariant)
   disqualifies.  The footprint is the sum over passes of the maximum
   row deviation (passes compose by adding stencil radii).
3. *Verified*: the full per-stage hook COMPOSITION (everything
   `hooks_at` will run on one extended block, in order) is executed
   CONCRETELY on a small random image and on three row blocks extended
   by the stage's total footprint — an interior block (both halos are
   true neighbor rows, the ppermute case) and the first/last blocks,
   whose frame-side halo is edge-replicated exactly as
   `extend_rows(mode="edge")` builds it.  Each block result must equal
   the corresponding full-image rows exactly.  This is the literal
   shard-equivariance property the halo pipeline relies on — anything
   the probe missed (size-as-value, //!WHEN flips, saved-texture
   geometry) fails here and the config falls back to GSPMD.  The
   boundary blocks catch what an interior check cannot (ADVICE r4):
   when >=2 stencil passes compose, pass 2 reads pass-1 values
   computed over edge-REPLICATED rows, which differ from the
   single-chip CLAMP of pass-1's frame-edge output row — such
   compositions are rejected here, not silently mis-rendered.

//!WHEN conditions see GLOBAL sizes during sharded execution via
`HookParams.size_override` (the probe and the verification use the
same override, so pass gating is identical everywhere).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["plan_halo_hooks"]

# generous cap: stencils larger than this are cheaper under GSPMD
_MAX_FOOTPRINT = 64


def _structurally_eligible(hook) -> bool:
    shader = getattr(hook, "user_shader", None)
    if shader is None:
        return False                    # opaque python hook
    if getattr(hook, "state_spec", None):
        return False                    # cross-frame state
    for buf in shader.buffers.values():
        if buf.storage:
            return False                # frame-global reductions
    for tex in shader.textures.values():
        if tex.storage:
            return False
    for p in shader.passes:
        if p.width is not None or p.height is not None:
            return False                # resizing pass
        if p.is_compute:
            return False                # workgroup-relative geometry
        if p.offset != (0.0, 0.0) or p.offset_align:
            return False                # needs the rect channel
    return True


def _access_footprint(accesses) -> Optional[int]:
    """Sum of per-pass maximum row deviations (+1 per pass for the
    bilinear support already included in the recorded taps).  None if
    any access is not row-aligned (a whole-row / scalar-row read needs
    the full frame)."""
    per_pass: Dict[int, float] = {}
    for pidx, iy, out_rows in accesses:
        arr = np.asarray(iy, np.float64)
        if arr.ndim == 0:
            return None                 # single global row
        flat = arr.reshape(arr.shape[0], -1)
        if arr.shape[0] != out_rows:
            return None                 # not one index (set) per out row
        rows = np.arange(out_rows, dtype=np.float64)
        dev = max(float((flat.max(1) - rows).max()),
                  float((rows - flat.min(1)).max()), 0.0)
        per_pass[pidx] = max(per_pass.get(pidx, 0.0), dev)
    total = int(np.ceil(sum(per_pass.values())))
    return total


def _probe_footprint(hook, stage, c, h, w, dst_w, dst_h,
                     size_override) -> Optional[int]:
    import jax
    import jax.numpy as jnp
    from ..render.hooks import HookParams
    from ..render.mpv_hooks import probe_recording

    rec: dict = {}
    hp = HookParams(stage=stage, src_h=h, src_w=w, dst_w=dst_w,
                    dst_h=dst_h, size_override=size_override)

    def run1(x):
        return hook.func(x, hp)

    try:
        with probe_recording(rec):
            out = jax.eval_shape(run1, jax.ShapeDtypeStruct(
                (c, h, w), jnp.float32))
    except Exception:
        return None
    if tuple(out.shape) != (c, h, w):
        return None                     # changed size/components
    if rec["pos_value"]:
        return None                     # position-dependent shading
    return _access_footprint(rec["accesses"])


def _verify_equivariance(hooks, stage, c, h, w, dst_w, dst_h,
                         size_override, fp: int) -> bool:
    """Concrete shard-equivariance check for the composed hook list the
    halo pipeline will run at `stage` (one `run_hooks` call on one
    block extended by the stage's TOTAL footprint `fp`, exactly like
    `hooks_at` in parallel/renderer.py).

    Three blocks must reproduce the full-image rows exactly:
      * an interior block — both halos are true neighbor rows (the
        ppermute case),
      * the FIRST and LAST blocks — the frame-side halo is
        edge-replicated exactly as `extend_rows(mode="edge")` does.
    The boundary checks are what reject multi-pass / multi-hook
    stencil compositions whose pass-2 taps read pass-1 values computed
    over replicated rows instead of the single-chip clamp of pass-1's
    edge row (ADVICE r4 high)."""
    import jax.numpy as jnp

    from ..render.hooks import run_hooks

    hv = max(4 * fp + 16, 32)
    wv = min(w, 192)
    rng = np.random.default_rng(12345)
    img = rng.random((c, hv, wv)).astype(np.float32)

    def run(x):
        out = run_hooks(list(hooks), stage, jnp.asarray(x), None,
                        dst_w=dst_w, dst_h=dst_h,
                        size_override=size_override)
        return np.asarray(out)

    try:
        full = run(img)
    except Exception:
        return False
    if full.shape != (c, hv, wv):
        return False

    if fp == 0:
        a, b = 3, hv - 3
        try:
            part = run(img[..., a:b, :])
        except Exception:
            return False
        return part.shape == (c, b - a, wv) and \
            bool(np.array_equal(part, full[..., a:b, :]))

    nb = max(fp + 3, 8)                  # local block rows per check

    def check(lo: int, hi: int) -> bool:
        top = (np.repeat(img[..., :1, :], fp, axis=-2) if lo == 0
               else img[..., lo - fp:lo, :])
        bot = (np.repeat(img[..., -1:, :], fp, axis=-2) if hi == hv
               else img[..., hi:hi + fp, :])
        ext = np.concatenate([top, img[..., lo:hi, :], bot], axis=-2)
        try:
            part = run(ext)
        except Exception:
            return False
        if part.shape != (c, (hi - lo) + 2 * fp, wv):
            return False
        return bool(np.array_equal(part[..., fp:fp + (hi - lo), :],
                                   full[..., lo:hi, :]))

    mid = (hv - nb) // 2
    return check(mid, mid + nb) and check(0, nb) and check(hv - nb, hv)


def plan_halo_hooks(params, plane_metas, repr_sys, H: int, W: int,
                    dst_w: int, dst_h: int, n_sp: int) -> Optional[dict]:
    """Build the halo execution plan for params.hooks, or None when any
    (hook, stage) pair is not provably a bounded row stencil (the
    caller then uses the GSPMD fallback).

    Returns {stage: {"hooks": [hook, ...], "F": total_footprint}} for
    every stage with at least one hook, plus "__sizes__": the global
    size_override dicts per stage."""
    from ..render.hooks import HookStage
    from ..render.mpv_hooks import _STAGE_NAME
    from ..render.renderer import Renderer

    # channel set of the combined image (alpha handled separately)
    chans = sorted({ch for meta in plane_metas for ch in meta[1]
                    if ch != 3})
    c_main = max(len(chans), 1)

    # per-stage (channels, global_h, global_w) the hook will see
    stage_geom: Dict[HookStage, Tuple[int, int, int]] = {}
    for (shape, mapping, sx, sy) in plane_metas:
        st_in, st_scaled = Renderer._plane_hook_stage(mapping, repr_sys)
        ph, pw = shape[-2], shape[-1]
        if st_in is not None:
            stage_geom.setdefault(st_in, (len(mapping), ph, pw))
        if st_scaled is not None:
            stage_geom.setdefault(st_scaled, (len(mapping), H, W))
    for st in (HookStage.NATIVE, HookStage.RGB, HookStage.LINEAR,
               HookStage.SIGMOID, HookStage.PRE_KERNEL):
        stage_geom[st] = (c_main, H, W)
    for st in (HookStage.POST_KERNEL, HookStage.SCALED,
               HookStage.PRE_OUTPUT, HookStage.OUTPUT):
        stage_geom[st] = (c_main, dst_h, dst_w)

    plan: Dict = {}
    sizes: Dict = {}
    for hook in params.hooks:
        if not _structurally_eligible(hook):
            return None
        for st, (c, h, w) in stage_geom.items():
            if not (hook.stages & st):
                continue
            stage_name = _STAGE_NAME.get(st)
            override = {"HOOKED": (h, w), "NATIVE": (H, W)}
            if stage_name:
                override[stage_name] = (h, w)
            fp = _probe_footprint(hook, st, c, h, w, dst_w, dst_h,
                                  override)
            if fp is None or fp > _MAX_FOOTPRINT:
                return None
            ent = plan.setdefault(st, {"hooks": [], "F": 0})
            ent["hooks"].append(hook)
            ent["F"] += fp
            sizes[st] = override

    # verify the per-stage COMPOSITION (everything hooks_at runs on one
    # extended block) with the accumulated footprint, including the
    # frame's first/last blocks — multi-pass / multi-hook stencil
    # chains that edge-replication cannot reproduce fail here and the
    # whole config falls back to GSPMD (ADVICE r4 high)
    for st, ent in plan.items():
        c, h, w = stage_geom[st]
        if h % n_sp != 0 or ent["F"] > h // n_sp:
            return None                 # halo exceeds the local block
        if not _verify_equivariance(ent["hooks"], st, c, h, w,
                                    dst_w, dst_h, sizes[st], ent["F"]):
            return None
    # hooks at stages the caller has no insertion point for are
    # rejected by the caller (it checks plan's keys)
    plan["__sizes__"] = sizes
    return plan
