"""HDR peak/histogram detection with temporal smoothing.

TPU-native rebuild of pl_shader_detect_peak + update_peak_buf
(src/shaders/colorspace.c:1155-1313, 1072-1146).  The reference runs a
compute pass building a 64-bin PQ histogram in workgroup shared memory
with subgroup reductions and global atomics into an SSBO, then reads it
back on the CPU for percentile + IIR smoothing.

Here the whole thing stays on device: the histogram is a fused XLA
comparison-reduction, the percentile interpolation runs on the 64-bin
vector, and the IIR state (avg_pq, max_pq) is a carried jnp array —
no host round trip.  Same-frame detection is the default (XLA schedules
the reduction before its use — no stall); `allow_delayed` applies the
previous frames' smoothed stats instead, which lets XLA fuse the
histogram reduction into the color-map pass (one fewer 4K read).

Histogram layout matches the reference exactly: PQ_BITS=14 fixed point,
7-bit histogram biased by half the PQ range (SDR content clumps into
bin 0), HIST_BINS = 64 (colorspace.c:915-931).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.colorspace import COLOR_HDR_BLACK, COLOR_SDR_WHITE
from ..core.transfer import pq_oetf_fast as pq_oetf

__all__ = ["PeakDetectParams", "peak_detect_state_init", "detect_peak",
           "applied_stats"]

PQ_BITS = 14
PQ_MAX = (1 << PQ_BITS) - 1
HIST_BITS = 7
HIST_BIAS = 1 << (HIST_BITS - 1)
HIST_BINS = (1 << HIST_BITS) - HIST_BIAS   # 64


@dataclass(frozen=True)
class PeakDetectParams:
    """Reference pl_peak_detect_params (shaders/colorspace.h:104-150);
    defaults mirror pl_peak_detect_default_params."""
    smoothing_period: float = 20.0
    scene_threshold_low: float = 1.0     # % PQ
    scene_threshold_high: float = 3.0    # % PQ
    percentile: float = 100.0
    black_cutoff: float = 1.0            # % PQ; ignore pixels below
    # Reference allow_delayed (colorspace.h:144-147): tone-map with the
    # PREVIOUS frames' smoothed stats instead of stalling on this
    # frame's histogram.  Default True — a deliberate TPU-native
    # deviation from the reference default (false): it decouples the
    # tone map from the current frame's reduction, letting the fused
    # Pallas epilogue measure the histogram INSIDE the color-map kernel
    # (no separate full-frame peak pass; 101.5 -> 112.9 fps at 4K), and
    # the 1-frame lag is imperceptible under the 20-frame IIR smoothing
    # the stats pass through anyway.  Set False for reference-default
    # same-frame adaptation.  First frame falls back to the static
    # HDR-metadata curve (like the reference before its first
    # readback).
    allow_delayed: bool = True

    def key(self):
        return (self.smoothing_period, self.scene_threshold_low,
                self.scene_threshold_high, self.percentile,
                self.black_cutoff, self.allow_delayed)


def peak_detect_state_init() -> jnp.ndarray:
    """Carried state [avg_pq, max_pq]; zeros mean 'unset'."""
    return jnp.zeros((2,), jnp.float32)


def _smoothstep(e0, e1, x):
    t = jnp.clip((x - e0) / (e1 - e0), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def applied_stats(img_linear, state, params: PeakDetectParams,
                  src_max_pq: float, axis_name=None, phase_geom=None):
    """detect_peak + the allow_delayed policy: returns the (avg_pq,
    max_pq) the tone map should APPLY this frame, plus the new state.

    Default: this frame's smoothed stats (same-frame detection).  With
    params.allow_delayed, the previous state is applied instead —
    decoupling the tone map from the current reduction so XLA can fuse
    the histogram into the color-map pass — falling back to the static
    HDR metadata peak (`src_max_pq`) on the first frame (reference:
    before the first readback the color map uses metadata defaults)."""
    avg, mx, new_state = detect_peak(img_linear, state, params,
                                     axis_name=axis_name,
                                     phase_geom=phase_geom)
    if not params.allow_delayed:
        return avg, mx, new_state
    return delayed_stats(state, src_max_pq) + (new_state,)


def delayed_stats(state, src_max_pq: float):
    """The (avg_pq, max_pq) an allow_delayed frame applies: the previous
    state, falling back to the static metadata peak when unset."""
    prev_avg, prev_max = state[0], state[1]
    unset = prev_max == 0.0
    return (jnp.where(unset, 0.0, prev_avg),
            jnp.where(unset, jnp.float32(src_max_pq), prev_max))


def _pixel_pq(img_linear, params: PeakDetectParams):
    """Shared per-pixel stage: linear RGB -> (pq, active_mask, hist_bin).
    Used by detect_peak and by the fused-kernel partials
    (block_partials)."""
    maxrgb = jnp.max(img_linear, axis=-3)
    pq = pq_oetf(jnp.maximum(maxrgb, 0.0) * (COLOR_SDR_WHITE / 10000.0))
    pq = jnp.clip(pq, 0.0, 1.0)
    pq14 = jnp.round(pq * PQ_MAX).astype(jnp.int32)
    active = pq > params.black_cutoff / 100.0
    bins = jnp.clip((pq14 >> (PQ_BITS - HIST_BITS)) - HIST_BIAS,
                    0, HIST_BINS - 1)
    return pq, active, bins


def _temporal_update(avg_cur, max_cur, wg_bias, state,
                     params: PeakDetectParams):
    """Shared IIR smoothing + scene-change cut (reference
    update_peak_buf, colorspace.c:1122-1146)."""
    prev_avg, prev_max = state[0], state[1]
    unset = prev_avg == 0.0
    eps = 1.0 / PQ_MAX
    avg_in = jnp.where(jnp.abs(avg_cur - prev_avg) < eps, prev_avg, avg_cur)
    max_in = jnp.where(jnp.abs(max_cur - prev_max) < eps, prev_max, max_cur)

    if params.smoothing_period > 0:
        coeff = 1.0 - np.exp(-1.0 / params.smoothing_period)
    else:
        coeff = 1.0
    avg_s = prev_avg + coeff * (avg_in - prev_avg)
    max_s = prev_max + coeff * (max_in - prev_max)

    if params.scene_threshold_low > 0 and params.scene_threshold_high > 0:
        log10_pq = 1e-2
        t_lo = params.scene_threshold_low * log10_pq
        t_hi = params.scene_threshold_high * log10_pq
        delta = wg_bias * jnp.abs(avg_in - prev_avg)
        mix = _smoothstep(t_lo, t_hi, delta)
        avg_s = avg_s + (avg_in - avg_s) * mix
        max_s = max_s + (max_in - max_s) * mix

    avg_out = jnp.where(unset, avg_cur, avg_s)
    max_out = jnp.where(unset, max_cur, max_s)
    new_state = jnp.stack([avg_out, max_out]).astype(jnp.float32)
    return avg_out, max_out, new_state


PARTIAL_SHAPE = (8, 128)   # one f32 VMEM tile per block


def block_partials(img_block, params: PeakDetectParams):
    """Per-block peak partials for the fused Pallas epilogue
    (ops.pallas.color_map): the block plays the reference's *workgroup*
    role (colorspace.c:1240-1290) — here one row-stripe instead of a
    16x16 tile; the mean-of-workgroup-means estimate differs only in
    the partition shape.  The histogram is exact (per-pixel, no tiling).

    Returns ONE (8, 128) f32 tile (Mosaic wants lane-tiled outputs):
    row 0 lanes 0..63 = the 64-bin histogram; row 1 lanes 0..2 =
    [pq_sum_active, active_count, pq_max]."""
    pq, active, bins = _pixel_pq(img_block, params)
    b = jnp.where(active, bins, -1)
    hist = jnp.stack([jnp.sum((b == k).astype(jnp.float32))
                      for k in range(HIST_BINS)])
    row0 = jnp.concatenate([hist, jnp.zeros(128 - HIST_BINS, jnp.float32)])
    row1 = jnp.concatenate([
        jnp.stack([jnp.sum(jnp.where(active, pq, 0.0)),
                   jnp.sum(active.astype(jnp.float32)),
                   jnp.max(pq)]),
        jnp.zeros(125, jnp.float32)])
    return jnp.concatenate(
        [row0[None], row1[None], jnp.zeros((6, 128), jnp.float32)])


def finish_from_packed(packed, state, params: PeakDetectParams):
    """finish_from_partials on (G, 8, 128) packed block_partials."""
    return finish_from_partials(
        packed[:, 0, :HIST_BINS],
        jnp.concatenate([packed[:, 1, :3],
                         jnp.ones((packed.shape[0], 1), jnp.float32),
                         jnp.zeros((packed.shape[0], 4), jnp.float32)],
                        axis=-1),
        state, params)


def finish_from_partials(hists, stats, state, params: PeakDetectParams):
    """Combine per-block partials -> (avg_pq, max_pq, new_state); the
    percentile interpolation is the exact 64-bin formulation of
    measure_peak (colorspace.c:1020-1065)."""
    hist = jnp.sum(hists, axis=0)
    sums = jnp.sum(stats, axis=0)
    blk_avg = stats[:, 0] / jnp.maximum(stats[:, 1], 1.0)
    blk_active = stats[:, 1] > 0
    wg_count = jnp.sum(blk_active)
    frame_avg = jnp.sum(jnp.where(blk_active, blk_avg, 0.0)) / \
        jnp.maximum(wg_count, 1)
    frame_max = jnp.max(stats[:, 2])
    wg_bias = wg_count / jnp.maximum(sums[3], 1.0)

    use_hist = 0 < params.percentile < 100
    if use_hist:
        total = jnp.sum(hist)
        target = jnp.ceil(params.percentile / 100.0 * total)
        csum = jnp.cumsum(hist)
        bin_idx = jnp.argmax(csum >= target).astype(jnp.int32)
        cl = csum[bin_idx] - hist[bin_idx]
        ch = cl + hist[bin_idx] + 1.0
        pq_low = ((bin_idx + HIST_BIAS) << (PQ_BITS - HIST_BITS)) / PQ_MAX
        pq_high0 = ((bin_idx + 1 + HIST_BIAS) <<
                    (PQ_BITS - HIST_BITS)) / PQ_MAX
        pq_high = jnp.where(ch > total, frame_max, pq_high0)
        ratio = (target - cl) / jnp.maximum(ch - cl, 1.0)
        measured = pq_low + (pq_high - pq_low) * ratio
        max_cur = jnp.where(total > 0, measured, frame_max)
    else:
        max_cur = frame_max

    has_content = wg_count > 0
    avg_cur = jnp.where(has_content, frame_avg, COLOR_HDR_BLACK)
    max_cur = jnp.where(has_content, max_cur, COLOR_HDR_BLACK)
    return _temporal_update(avg_cur, max_cur, wg_bias, state, params)


def detect_peak(img_linear, state, params: PeakDetectParams,
                axis_name: Optional[str] = None,
                phase_geom: Optional[Tuple[int, int, int, int]] = None,
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Measure the frame and update the temporal state.

    img_linear: (..., 3, H, W) linear light in NORM units (1.0 = SDR
    white). Returns (avg_pq, max_pq, new_state) — smoothed values as
    traced scalars, PQ-encoded in [0,1].

    With `axis_name`, the frame is row-sharded over that mesh axis
    (inside shard_map) and every frame-global statistic — workgroup
    averages, max, and both radix histogram levels — is finished with a
    `psum`/`pmax` collective, so the multi-chip result equals the
    single-chip one (exactly so when the local row count is a multiple
    of the 16-row tile).  This is the ICI analog of the reference's
    global atomics into one SSBO (colorspace.c:1155-1313).
    """
    def _rsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    def _rmax(x):
        return jax.lax.pmax(x, axis_name) if axis_name else x

    # maxRGB -> relative PQ (reference: PQ of the max component, clamped
    # to the valid signal range — scaler ringing can overshoot)
    pq, active_mask, bins = _pixel_pq(img_linear, params)

    # --- per-workgroup (16x16 tile) average, like the reference's
    # shmem-reduced wg averages (colorspace.c:1240-1290)
    th, tw = 16, 16
    if phase_geom is not None:
        # img is in phase-block layout (ops.polar.to_phase_blocks):
        # rows = Py*Px*Hb, cols = Wb.  A 16x16 spatial tile is the union
        # of one (16/Py, 16/Px) sub-tile from each phase block at the
        # same (tile_y, tile_x) — reshapes + reductions, no re-interleave
        Py, Px, Hb, Wb = phase_geom
        assert th % Py == 0 and tw % Px == 0 and \
            Hb % (th // Py) == 0 and Wb % (tw // Px) == 0, phase_geom
        tb, lb = th // Py, tw // Px
        shp = pq.shape[:-2] + (Py * Px, Hb // tb, tb, Wb // lb, lb)
        tiles = pq.reshape(shp)
        acts = active_mask.reshape(shp)
        tile_sum = jnp.sum(jnp.where(acts, tiles, 0.0), axis=(-5, -3, -1))
        tile_cnt = jnp.sum(acts, axis=(-5, -3, -1))
        tile_max = jnp.max(tiles, axis=(-5, -3, -1))
    else:
        H, W = pq.shape[-2], pq.shape[-1]
        Hp = (H + th - 1) // th * th
        Wp = (W + tw - 1) // tw * tw
        pq_pad = jnp.pad(pq, [(0, 0)] * (pq.ndim - 2) +
                         [(0, Hp - H), (0, Wp - W)])
        act_pad = jnp.pad(active_mask, [(0, 0)] * (pq.ndim - 2) +
                          [(0, Hp - H), (0, Wp - W)])
        tiles = pq_pad.reshape(*pq.shape[:-2], Hp // th, th, Wp // tw, tw)
        acts = act_pad.reshape(*pq.shape[:-2], Hp // th, th, Wp // tw, tw)
        tile_sum = jnp.sum(jnp.where(acts, tiles, 0.0), axis=(-3, -1))
        tile_cnt = jnp.sum(acts, axis=(-3, -1))
        tile_max = jnp.max(tiles, axis=(-3, -1))
    tile_avg = tile_sum / jnp.maximum(tile_cnt, 1)
    wg_active = tile_cnt > 0
    wg_count = _rsum(jnp.sum(wg_active))
    n_active = jnp.maximum(wg_count, 1)
    frame_avg = _rsum(jnp.sum(jnp.where(wg_active, tile_avg, 0.0))) \
        / n_active
    # hierarchical max: finish over the tile maxima so the tile pass is
    # the ONLY full read of pq (padding zeros can't win: pq >= 0)
    frame_max = _rmax(jnp.max(tile_max))
    total_wgs = _rsum(jnp.asarray(float(wg_active.size), jnp.float32))
    wg_bias = wg_count / total_wgs

    use_hist = 0 < params.percentile < 100
    if use_hist:
        # Two-level radix percentile over the 64-bin histogram.  A naive
        # one-hot (or 64 sibling reductions) is VPU compute-bound at ~64
        # compares/pixel (~1-3 ms at 4K); splitting the 6-bit bin index
        # into hi/lo 3-bit halves needs only 8+8 compares/pixel across
        # two fused reduction passes (~0.3 ms) and reconstructs the
        # EXACT same 64-bin percentile: first locate the hi-group
        # containing the target count, then histogram the lo bits of
        # that group only.  (A gather/scatter histogram is pathological
        # on TPU; this is the comparison-reduce equivalent of the
        # reference's shmem+atomics pass, colorspace.c:1155-1313.)
        b = jnp.where(active_mask, bins, -1)     # inactive match nothing
        hi = b >> 3                              # -1 stays -1
        lo = b & 7
        hi_hist = _rsum(jnp.stack([jnp.sum((hi == a).astype(jnp.float32))
                                   for a in range(8)]))
        total = jnp.sum(hi_hist)
        target = jnp.ceil(params.percentile / 100.0 * total)
        hi_csum = jnp.cumsum(hi_hist)
        # group containing the target-th active pixel
        a_star = jnp.argmax(hi_csum >= target).astype(jnp.int32)
        base = hi_csum[a_star] - hi_hist[a_star]
        sel = hi == a_star                       # traced compare
        lo_hist = _rsum(jnp.stack([
            jnp.sum((sel & (lo == bb)).astype(jnp.float32))
            for bb in range(8)]))
        lo_csum = jnp.cumsum(lo_hist)
        b_star = jnp.argmax(base + lo_csum >= target).astype(jnp.int32)
        bin_idx = a_star * 8 + b_star

        # percentile interpolation (reference measure_peak,
        # colorspace.c:1020-1065); cl/ch identical to the full-histogram
        # formulation: csum_{k-1} < target <= csum_k picks bin k
        cl = base + lo_csum[b_star] - lo_hist[b_star]
        ch = cl + lo_hist[b_star] + 1.0
        pq_low = ((bin_idx + HIST_BIAS) << (PQ_BITS - HIST_BITS)) / PQ_MAX
        pq_high0 = ((bin_idx + 1 + HIST_BIAS) <<
                    (PQ_BITS - HIST_BITS)) / PQ_MAX
        pq_high = jnp.where(ch > total, frame_max, pq_high0)
        ratio = (target - cl) / jnp.maximum(ch - cl, 1.0)
        measured = pq_low + (pq_high - pq_low) * ratio
        max_cur = jnp.where(total > 0, measured, frame_max)
    else:
        max_cur = frame_max

    has_content = wg_count > 0
    avg_cur = jnp.where(has_content, frame_avg, COLOR_HDR_BLACK)
    max_cur = jnp.where(has_content, max_cur, COLOR_HDR_BLACK)

    # --- temporal smoothing (reference update_peak_buf:1122-1146)
    return _temporal_update(avg_cur, max_cur, wg_bias, state, params)
