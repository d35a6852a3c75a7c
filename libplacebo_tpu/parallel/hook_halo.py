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
   introspectable); every pass same-size (no WIDTH/HEIGHT); no
   //!OFFSET (the halo path has no rect channel); no atomicAdd on
   STORAGE buffers (a frame-global reduction).  COMPUTE passes are
   allowed when threads == block (the per-pixel invocation grid —
   shared-tile fills are translation-covariant after transparent
   replay, which the equivariance check then PROVES concretely);
   4-arg //!COMPUTE (threads != block) keeps workgroup-anchored
   geometry and stays on GSPMD.  Cross-frame state is allowed when it
   is row-shardable: per-pixel STORAGE textures sized exactly like the
   hooked stage (sharded with the rows, r5) and STORAGE buffer vars
   with uniform (non-reduced) updates (carried replicated; the
   verification rejects any shard-varying evolution).  Stateful hooks
   must hook exactly ONE executed stage (the state crop bookkeeping is
   per-stage).

2. *Probed*: the hook runs once under `jax.eval_shape` with
   `mpv_hooks.probe_recording` active — every access to an
   image-derived texture (including carried STORAGE textures) logs its
   row-index pattern, and any materialization of a sampling position
   into value arithmetic (position-dependent shading, which is NOT
   shard-shift invariant) disqualifies.  The footprint is the sum over
   passes of the maximum row deviation (passes compose by adding
   stencil radii).

3. *Verified*: the full per-stage hook COMPOSITION (everything
   `hooks_at` will run on one extended block, in order) is executed
   CONCRETELY and compared against the full-image result on an
   interior row block (both halos are true neighbor rows — the
   ppermute case) and on the FIRST and LAST blocks, whose frame-side
   halo is edge-replicated exactly as `extend_rows(mode="edge")`
   builds it.  Each block result must match the corresponding
   full-image rows exactly.  Stateful compositions are verified at the
   REAL stage geometry with RANDOM carried state threaded through
   `run_hooks` — outputs AND state_out must both be shard-equivariant
   (texture state row-for-row, buffer state identically), which by
   induction gives multi-frame parity.  The boundary blocks catch what
   an interior check cannot (ADVICE r4): when >=2 stencil passes
   compose, pass 2 reads pass-1 values computed over edge-REPLICATED
   rows, which differ from the single-chip CLAMP of pass-1's
   frame-edge output row — such compositions are rejected here, not
   silently mis-rendered.

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
    state_spec = getattr(hook, "state_spec", None) or {}
    if any(k.startswith("buf:") for k in state_spec):
        # STORAGE buffer state is eligible only when its evolution is
        # uniform: atomicAdd sums over the pixel grid (a frame-global
        # reduction a row shard cannot compute); plain assignments are
        # uniform by construction (_collect_buf_writes rejects
        # per-pixel values) and the equivariance check verifies the
        # carried scalar evolves identically on every block
        if any("atomicAdd" in p.body for p in shader.passes):
            return False
    for p in shader.passes:
        if p.width is not None or p.height is not None:
            return False                # resizing pass
        if p.is_compute:
            # threads == block (2-arg //!COMPUTE): per-pixel invocation
            # grid, translation-covariant after shared-array replay —
            # provable by the concrete equivariance check.  4-arg
            # COMPUTE anchors workgroup geometry to the frame origin.
            if (p.threads_w, p.threads_h) not in (
                    (0, 0), (p.block_w, p.block_h)):
                return False
        if p.offset != (0.0, 0.0) or p.offset_align:
            return False                # needs the rect channel
    return True


def _state_shardable(hook, stage_geom, executed_stages) -> bool:
    """Cross-frame state must be row-shardable: texture state sized
    exactly like the (single) hooked stage; see module docstring."""
    state_spec = getattr(hook, "state_spec", None) or {}
    if not state_spec:
        return True
    hooked = [st for st in executed_stages if hook.stages & st]
    if len(hooked) != 1:
        return False                    # per-stage state bookkeeping
    c, h, w = stage_geom[hooked[0]]
    for name, init in state_spec.items():
        if name.startswith("tex:"):
            shp = np.shape(init)
            if len(shp) != 3 or shp[-2:] != (h, w):
                return False            # not per-pixel at this stage
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


def _extend_np(arr, lo, hi, fp, hv):
    """Edge/true halo extension of full-array rows [lo, hi) — exactly
    what extend_rows(mode='edge') produces for that block."""
    if fp == 0:
        return arr[..., lo:hi, :]
    top = (np.repeat(np.asarray(arr)[..., :1, :], fp, axis=-2) if lo == 0
           else np.asarray(arr)[..., lo - fp:lo, :])
    bot = (np.repeat(np.asarray(arr)[..., -1:, :], fp, axis=-2)
           if hi == hv else np.asarray(arr)[..., hi:hi + fp, :])
    return np.concatenate([top, np.asarray(arr)[..., lo:hi, :], bot],
                          axis=-2)


def _verify_equivariance(hooks, stage, c, h, w, dst_w, dst_h,
                         size_override, fp: int, n_sp: int = 4) -> bool:
    """Concrete shard-equivariance check for the composed hook list the
    halo pipeline will run at `stage` (one `run_hooks` call on one
    block extended by the stage's TOTAL footprint `fp`, exactly like
    `hooks_at` in parallel/renderer.py).  See module docstring item 3.
    """
    import jax.numpy as jnp

    from ..render.hooks import run_hooks

    state_specs = [(hk, tuple(sorted(hk.state_spec)))
                   for hk in hooks if getattr(hk, "state_spec", None)]
    rng = np.random.default_rng(12345)
    if state_specs:
        # carried texture state is row-sharded alongside the image, so
        # the verification must run at the REAL stage geometry (state
        # shapes are fixed by the shader's //!TEXTURE declarations)
        hv, wv = h, w
        nb = h // n_sp
    else:
        hv = max(4 * fp + 16, 32)
        wv = min(w, 192)
        nb = max(fp + 3, 8)
    img = rng.random((c, hv, wv)).astype(np.float32)

    def mk_states(lo=None, hi=None, full_states=None):
        if not state_specs:
            return None
        states = {}
        for hk, names in state_specs:
            sin = {}
            for n in names:
                v = full_states[(hk.signature, n)]
                if n.startswith("tex:") and lo is not None:
                    v = _extend_np(v, lo, hi, fp, hv)
                sin[n] = jnp.asarray(v)
            states[hk.signature] = (sin, {})
        return states

    full_states = None
    if state_specs:
        full_states = {}
        for hk, names in state_specs:
            for n in names:
                init = hk.state_spec[n]
                # RANDOM carried state: equivariance for arbitrary
                # state + equivariant state_out gives multi-frame
                # parity by induction
                full_states[(hk.signature, n)] = rng.random(
                    np.shape(init)).astype(np.float32)

    def run(x, states):
        out = run_hooks(list(hooks), stage, jnp.asarray(x), None,
                        states=states, dst_w=dst_w, dst_h=dst_h,
                        size_override=size_override)
        souts = {}
        if states:
            for hk, names in state_specs:
                sin, sout = states[hk.signature]
                for n in names:
                    souts[(hk.signature, n)] = np.asarray(
                        sout.get(n, sin[n]))
        return np.asarray(out), souts

    try:
        full, full_souts = run(img, mk_states(full_states=full_states))
    except Exception:
        return False
    if full.shape != (c, hv, wv):
        return False

    def check(lo: int, hi: int) -> bool:
        ext = _extend_np(img, lo, hi, fp, hv)
        try:
            part, souts = run(ext, mk_states(lo, hi, full_states))
        except Exception:
            return False
        if part.shape != (c, (hi - lo) + 2 * fp, wv):
            return False
        if not np.array_equal(part[..., fp:fp + (hi - lo), :]
                              if fp else part, full[..., lo:hi, :]):
            return False
        for key, v in souts.items():
            fv = full_souts[key]
            if key[1].startswith("tex:"):
                inner = v[..., fp:fp + (hi - lo), :] if fp else v
                if not np.array_equal(inner, fv[..., lo:hi, :]):
                    return False        # state not row-equivariant
            elif not np.array_equal(v, fv):
                return False            # buffer state shard-varying
        return True

    mid = (hv - nb) // 2
    blocks = [(mid, mid + nb), (0, nb), (hv - nb, hv)]
    seen = set()
    for lo, hi in blocks:
        if (lo, hi) in seen:
            continue
        seen.add((lo, hi))
        if not check(lo, hi):
            return False
    return True


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
        executed = [st for st in stage_geom if hook.stages & st]
        if not _state_shardable(hook, stage_geom, executed):
            return None
        for st in executed:
            c, h, w = stage_geom[st]
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
                                    dst_w, dst_h, sizes[st], ent["F"],
                                    n_sp):
            return None
    # hooks at stages the caller has no insertion point for are
    # rejected by the caller (it checks plan's keys)
    plan["__sizes__"] = sizes
    return plan
