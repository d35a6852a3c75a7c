"""AV1 film grain synthesis: device-side application.

TPU-native rebuild of the GPU half of pl_shader_fg_av1
(src/shaders/film_grain_av1.c:605-1015).  The reference's compute shader
fetches packed per-block offsets from a LUT and samples the grain
texture per pixel.

TPU-first design: grain offsets have a 16x16 alphabet (4-bit x, 4-bit y,
scaled by 2), so there are only 256 possible grain tiles per LUT.  The
host precomputes the full tile stack (256, bh, bw) plus edge stacks for
overlap blending; the device *gathers whole tiles* by block index — one
`jnp.take` of contiguous rows per block instead of 25M per-pixel
gathers.  Overlap blending (AV1 variance-preserving 27/17 + 23/22
weights) is applied on the tiled layout with row/column masks.  All
table lookups (whole-tile gathers AND the 256-entry spec scaling LUT)
lower to one-hot MXU matmuls — XLA's native gather measures ~5-10x
slower for these shapes on TPU, and one-hot selection is exact (a
single 1.0 per row).  The scaling LUT itself is the spec's fixed-point
table (core.film_grain.generate_scaling, film_grain_av1.c:468-497),
sampled with linear filtering exactly like the reference's LUT
texture — MORE faithful than the previous float segment lerp.

Because the grain seed (and hence every table) changes per frame, all
tables enter the jitted pipeline as *traced arguments* (GrainTables
pytree) — one compiled program serves every frame; only the tiny tables
are re-uploaded. Host generation is lru-cached per (params, seed).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import film_grain as fg
from ..core.film_grain import (BLOCK_SIZE, AV1GrainData, FilmGrainData,
                               GRAIN_HEIGHT_LUT, GRAIN_WIDTH_LUT)

__all__ = ["needs_fg", "needs_film_grain", "GrainCfg", "prepare_av1_grain",
           "apply_av1_grain"]

MAX_SCALING_POINTS = 15
SCALING_N = 256


def needs_fg(data: Optional[FilmGrainData]) -> bool:
    """Reference pl_needs_fg (film_grain.h:124)."""
    if data is None or data.type != "av1" or data.av1 is None:
        return False
    a = data.av1
    return (a.num_points_y > 0 or a.num_points_uv[0] > 0 or
            a.num_points_uv[1] > 0 or a.chroma_scaling_from_luma)


def needs_film_grain(data: Optional[FilmGrainData],
                     channels: Tuple[int, ...] = (0, 1, 2)) -> bool:
    """Whether grain must be applied to a plane carrying `channels`
    (canonical ids 0=Y, 1=Cb, 2=Cr) — the type-dispatching front-end
    (reference pl_needs_film_grain, film_grain.c:21, per-type checks
    film_grain_av1.c:551 / film_grain_h274.c:128)."""
    if data is None:
        return False
    if data.type == "av1" and data.av1 is not None:
        a = data.av1
        has = (a.num_points_y > 0,
               a.num_points_uv[0] > 0 or a.chroma_scaling_from_luma,
               a.num_points_uv[1] > 0 or a.chroma_scaling_from_luma)
        return any(0 <= ch < 3 and has[ch] for ch in channels)
    if data.type == "h274" and data.h274 is not None:
        d = data.h274
        if d.model_id != 0:
            return False
        return any(0 <= ch < 3 and d.component_model_present[ch]
                   for ch in channels)
    return False


@dataclass(frozen=True)
class GrainCfg:
    """Static (trace-baked) grain configuration; everything that rarely
    changes. Channels: canonical ids carried by the plane (0=Y,1=Cb,2=Cr)."""
    channels: Tuple[int, ...]
    active: Tuple[bool, ...]          # per channel: grain applied?
    overlap: bool = True
    chroma_scaling_from_luma: bool = False
    sub_x: int = 0
    sub_y: int = 0
    bits: int = 8
    limited_range: bool = True
    is_ycbcr: bool = True

    def key(self):
        return self


class ChannelTables(NamedTuple):
    tiles: jnp.ndarray      # (256, bh, bw)
    right: jnp.ndarray      # (256, bh, ox)
    bottom: jnp.ndarray     # (256, oy, bw)
    corner: jnp.ndarray     # (256, oy, ox)
    scaling: jnp.ndarray    # (256,) float32 spec scaling LUT (already
                            # includes the 1/2^scaling_shift range)
    uv_consts: jnp.ndarray  # (3,) [mult_luma, mult, offset]


class GrainTables(NamedTuple):
    offsets: jnp.ndarray            # (nby, nbx) int32 (packed uint32 bits)
    chans: Tuple[ChannelTables, ...]


@lru_cache(maxsize=16)
def _tile_stacks_np(data: AV1GrainData, seed: int, channel: int,
                    sub_x: int, sub_y: int, bits: int):
    if channel == 0:
        lut, _ = fg.generate_grain_y(data, seed, bits)
    else:
        lut = fg.generate_grain_uv(data, seed, channel, sub_x, sub_y, bits)
    bw = BLOCK_SIZE >> sub_x
    bh = BLOCK_SIZE >> sub_y
    ox_scale = 1 if sub_x else 2
    oy_scale = 1 if sub_y else 2
    n_ox = max(2 >> sub_x, 1)
    n_oy = max(2 >> sub_y, 1)

    tiles = np.zeros((256, bh, bw), np.float32)
    right = np.zeros((256, bh, n_ox), np.float32)
    bottom = np.zeros((256, n_oy, bw), np.float32)
    corner = np.zeros((256, n_oy, n_ox), np.float32)
    for v in range(256):
        ox = (v >> 4) * ox_scale
        oy = (v & 0xF) * oy_scale
        tiles[v] = lut[oy:oy + bh, ox:ox + bw]
        right[v] = lut[oy:oy + bh, ox + bw:ox + bw + n_ox]
        bottom[v] = lut[oy + bh:oy + bh + n_oy, ox:ox + bw]
        corner[v] = lut[oy + bh:oy + bh + n_oy, ox + bw:ox + bw + n_ox]
    return tiles, right, bottom, corner


def _padded_points(points) -> Tuple[np.ndarray, int]:
    pts = np.zeros((MAX_SCALING_POINTS, 2), np.float32)
    n = min(len(points), MAX_SCALING_POINTS)
    for i in range(n):
        pts[i] = points[i]
    # replicate last point so padded segments are degenerate
    for i in range(n, MAX_SCALING_POINTS):
        pts[i] = pts[max(n - 1, 0)]
    return pts, n


def grain_cfg_for(data: FilmGrainData, channels: Tuple[int, ...],
                  bits: int = 8, sub_x: int = 0, sub_y: int = 0,
                  limited_range: bool = True,
                  is_ycbcr: bool = True) -> GrainCfg:
    a = data.av1
    active = tuple(
        (a.num_points_y > 0) if ch == 0 else
        (a.num_points_uv[ch - 1] > 0 or a.chroma_scaling_from_luma)
        for ch in channels)
    return GrainCfg(channels=channels, active=active, overlap=a.overlap,
                    chroma_scaling_from_luma=a.chroma_scaling_from_luma,
                    sub_x=sub_x, sub_y=sub_y, bits=bits,
                    limited_range=limited_range, is_ycbcr=is_ycbcr)


def prepare_av1_grain(data: FilmGrainData, cfg: GrainCfg,
                      h: int, w: int) -> GrainTables:
    """Host-side per-frame table prep (cached per seed/params)."""
    a = data.av1
    bw = BLOCK_SIZE >> cfg.sub_x
    bh = BLOCK_SIZE >> cfg.sub_y
    nbx = (w + bw - 1) // bw
    # +2 block rows beyond the frame: a row-sharded application slices
    # this table with a traced start (dynamic_slice of static size
    # local_blocks+2), and the offsets LFSR is seeded per block row so
    # extra rows never change earlier ones (core/film_grain.py:241)
    nby = (h + bh - 1) // bh + 2
    offsets = fg.generate_offsets(data.seed, nbx, nby)

    grain_scale = 1.0 / ((1 << cfg.bits) - 1)
    chans = []
    for ch, act in zip(cfg.channels, cfg.active):
        if not act:
            z = jnp.zeros((1,), jnp.float32)
            chans.append(ChannelTables(z, z, z, z, z, z))
            continue
        stacks = _tile_stacks_np(a, data.seed, ch,
                                 cfg.sub_x if ch else 0,
                                 cfg.sub_y if ch else 0, cfg.bits)
        if ch == 0 or cfg.chroma_scaling_from_luma:
            pts = a.points_y
            uv = np.zeros(3, np.float32)
        else:
            pts = a.points_uv[ch - 1]
            uv = np.array([a.uv_mult_luma[ch - 1] / 64.0,
                           a.uv_mult[ch - 1] / 64.0,
                           (a.uv_offset[ch - 1] << (cfg.bits - 8)) *
                           grain_scale], np.float32)
        lut = fg.generate_scaling(tuple(pts), a.scaling_shift)
        chans.append(ChannelTables(
            jnp.asarray(stacks[0]), jnp.asarray(stacks[1]),
            jnp.asarray(stacks[2]), jnp.asarray(stacks[3]),
            jnp.asarray(lut), jnp.asarray(uv)))
    return GrainTables(
        offsets=jnp.asarray(offsets.view(np.int32)), chans=tuple(chans))


# ---------------------------------------------------------------------------
# Traced application
# ---------------------------------------------------------------------------

def _assemble_plane(offsets, ct: ChannelTables, h, w, sub_x, sub_y,
                    overlap, grain_min, grain_max, row0=None):
    """Assemble the grain plane for rows [row0, row0+h) of the frame.
    row0=None means 0 (single-chip); a traced row0 is how the row-sharded
    renderer gets the exact per-block offsets of its global position."""
    bw = BLOCK_SIZE >> sub_x
    bh = BLOCK_SIZE >> sub_y
    nbx = (w + bw - 1) // bw
    n_ox = max(2 >> sub_x, 1)
    n_oy = max(2 >> sub_y, 1)

    if row0 is None:
        nby = (h + bh - 1) // bh
        off = offsets[:nby, :nbx]
        block_row0 = 0
    else:
        # one extra block row covers any intra-block start offset; the
        # prep pads the table so the dynamic_slice never clamps
        nby = (h + bh - 1) // bh + 1
        by0 = row0 // bh
        off = jax.lax.dynamic_slice(
            offsets, (by0, 0), (nby, nbx))
        block_row0 = by0
    idx_n = (off & 0xFF).reshape(-1)
    idx_l = ((off >> 8) & 0xFF).reshape(-1)
    idx_t = ((off >> 16) & 0xFF).reshape(-1)
    idx_tl = ((off >> 24) & 0xFF).reshape(-1)

    g = _take_rows(ct.tiles, idx_n).reshape(nby, nbx, bh, bw)

    if overlap:
        if n_ox == 2:
            wx_n, wx_o = [27.0, 17.0], [17.0, 27.0]
        else:
            wx_n, wx_o = [23.0], [22.0]
        if n_oy == 2:
            wy_n, wy_o = [27.0, 17.0], [17.0, 27.0]
        else:
            wy_n, wy_o = [23.0], [22.0]
        wxa = jnp.asarray(np.asarray(wx_n, np.float32) / 32.0)
        wxb = jnp.asarray(np.asarray(wx_o, np.float32) / 32.0)
        wya = jnp.asarray(np.asarray(wy_n, np.float32) / 32.0)
        wyb = jnp.asarray(np.asarray(wy_o, np.float32) / 32.0)

        has_l = (jnp.arange(nbx) > 0)[None, :, None, None]
        has_t = ((block_row0 + jnp.arange(nby)) > 0)[:, None, None, None]

        gl = _take_rows(ct.right, idx_l).reshape(nby, nbx, bh, n_ox)
        mixed_x = gl * wxa + g[..., :n_ox] * wxb
        g = g.at[..., :n_ox].set(
            jnp.where(has_l, mixed_x, g[..., :n_ox]))

        gt = _take_rows(ct.bottom, idx_t).reshape(nby, nbx, n_oy, bw)
        gc = _take_rows(ct.corner, idx_tl).reshape(
            nby, nbx, n_oy, n_ox)
        mixed_c = gc * wxa + gt[..., :n_ox] * wxb
        gt = gt.at[..., :n_ox].set(
            jnp.where(has_l, mixed_c, gt[..., :n_ox]))
        mixed_y = gt * wya[:, None] + g[..., :n_oy, :] * wyb[:, None]
        g = g.at[..., :n_oy, :].set(
            jnp.where(has_t, mixed_y, g[..., :n_oy, :]))

        g = jnp.clip(g, grain_min, grain_max)

    plane = g.transpose(0, 2, 1, 3).reshape(nby * bh, nbx * bw)
    if row0 is None:
        return plane[:h, :w]
    r_off = row0 - block_row0 * bh
    return jax.lax.dynamic_slice(
        plane, (r_off, 0), (h, plane.shape[1]))[:, :w]


def _scaling_eval(v, lut):
    """Sample the 256-entry spec scaling LUT with linear filtering —
    exactly how the reference samples its LUT texture
    (film_grain_av1.c:794: sample at (v*255+0.5)/256, bilinear).

    The LUT is viewed as a 16x16 table and each lookup becomes a
    quadratic form  onehot(idx>>4) @ T @ onehot(idx&15)  — the row
    contraction rides the MXU and the column select is a 16-wide VPU
    dot.  MEASURED at 1080p (r3): 0.90 ms/frame vs 3.15 ms for a flat
    256-wide two-hot matvec (the (H,W,256) weight tensor blows VMEM
    residency), vs 34.6 ms for XLA's native gather, and vs ~6 ms for
    the previous 13-segment closed-form (traced-scalar divides defeat
    strength reduction).  Bit-exact against all three; MORE
    spec-faithful than the float segment lerp (the LUT carries the
    fixed-point delta arithmetic, core.film_grain.generate_scaling)."""
    x = jnp.clip(v, 0.0, 1.0) * 255.0
    lo = jnp.floor(x)
    f = (x - lo).astype(jnp.float32)
    table = lut.reshape(16, 16)
    g16 = jnp.arange(16, dtype=jnp.int32)

    def q(idx):
        ohr = ((idx >> 4)[..., None] == g16).astype(jnp.float32)
        ohc = ((idx & 15)[..., None] == g16).astype(jnp.float32)
        rows = jnp.einsum("...h,hl->...l", ohr, table,
                          precision="highest")
        return jnp.sum(rows * ohc, axis=-1)

    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, SCALING_N - 1)
    return q(lo_i) * (1.0 - f) + q(hi_i) * f


def subsample_nearest(x, sub_x, sub_y, ph, pw):
    """Nearest-neighbour subsample of a full-res plane to a chroma grid
    (reference: texelFetch at pos << sub, film_grain_av1.c:812) — feeds
    the chroma grain's luma term.

    Row (sublane) stride slicing is cheap on TPU, but a LANE-dim
    stride-2 slice of a *per-frame* tensor is pathological: MEASURED
    5.0 ms at 1080p->540p inside the render loop (XLA lowers the lane
    compaction as shift/select passes it cannot hoist), vs 0.12 ms for
    the same compaction as a one-hot column-select matmul on the MXU
    (exact — a single 1.0 per output column)."""
    if sub_y:
        x = x[..., ::1 << sub_y, :]
    x = x[..., :ph, :]
    if sub_x:
        w = x.shape[-1]
        cols = jnp.arange(pw, dtype=jnp.int32) << sub_x
        sel = (jnp.arange(w, dtype=jnp.int32)[:, None] == cols[None, :]
               ).astype(jnp.float32)
        return jnp.matmul(x, sel, precision="highest")
    return x[..., :pw]


def _take_rows(table, idx):
    """Row gather as a one-hot MXU matmul — exact (one 1.0 per row) and
    far faster than XLA's native row gather for (<=256, tile) tables."""
    n = table.shape[0]
    oh = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)
          ).astype(jnp.float32)
    flat = table.reshape(n, -1)
    out = jnp.matmul(oh, flat, precision="highest")
    return out.reshape((idx.shape[0],) + tuple(table.shape[1:]))


def apply_av1_grain(img, tables: GrainTables, cfg: GrainCfg,
                    scaling_shift: int,
                    luma: Optional[jnp.ndarray] = None, row0=None):
    """Apply AV1 grain to a plane (..., C, H, W); cfg/scaling_shift are
    static, tables traced.  `row0` (traced ok): the plane's global start
    row when img is one row-shard of the frame — block offsets and
    overlap flags then match the single-chip assembly exactly."""
    h, w = img.shape[-2], img.shape[-1]
    bits = cfg.bits
    grain_center = 128 << (bits - 8)
    grain_scale = 1.0 / ((1 << bits) - 1)
    grain_min = -grain_center * grain_scale
    grain_max = ((256 << (bits - 8)) - 1 - grain_center) * grain_scale

    if cfg.limited_range:
        out_scale = (1 << bits) / ((1 << bits) - 1.0)
        min_value = 16 / 256.0 * out_scale
        max_luma = 235 / 256.0 * out_scale
        max_chroma = (240 / 256.0 * out_scale) if cfg.is_ycbcr else max_luma
    else:
        min_value, max_luma, max_chroma = 0.0, 1.0, 1.0

    if luma is None and 0 in cfg.channels:
        luma = img[..., cfg.channels.index(0), :, :]

    out_comps = []
    for ci, (ch, act) in enumerate(zip(cfg.channels, cfg.active)):
        comp = img[..., ci, :, :]
        if not act:
            out_comps.append(comp)
            continue
        ct = tables.chans[ci]
        grain = _assemble_plane(tables.offsets, ct, h, w,
                                cfg.sub_x if ch else 0,
                                cfg.sub_y if ch else 0,
                                cfg.overlap, grain_min, grain_max,
                                row0=row0)
        if ch == 0 or cfg.chroma_scaling_from_luma:
            scale_in = comp if ch == 0 else luma
            vmax = max_luma if ch == 0 else max_chroma
        else:
            scale_in = (luma * ct.uv_consts[0] + comp * ct.uv_consts[1] +
                        ct.uv_consts[2])
            vmax = max_chroma
        scaling = _scaling_eval(scale_in, ct.scaling)
        comp = jnp.clip(comp + scaling * grain, min_value, vmax)
        out_comps.append(comp)

    return jnp.stack(out_comps, axis=-3)
