"""H.274 / SMPTE RDD-5 film grain synthesis.

TPU-native rebuild of src/shaders/film_grain_h274.c: the 13x13 grain
slice database is generated host-side from the spec tables (Gaussian
LUT, seed LUT, R64T integer transform — stored as a binary asset), and
application follows the reference's compute shader: per-8x8-block
average intensity selects a (scale, h, v) model, a PCG3D hash of the
16x16 macroblock position jitters the slice offset, and the grain is
added scaled.

The per-block 8x8 slice fetch uses the same whole-tile-gather pattern
as AV1 grain (ops/film_grain.py): every reachable (row, col) offset is
8-row/4-col aligned, so the host precomputes the full stack of aligned
8x8 tiles (104 x 207 = 21528 tiles, ~5.5 MB) and the device gathers ONE
contiguous tile per 8x8 block — nbx*nby indices instead of a 25M-entry
per-pixel gather (the known-pathological TPU pattern; VERDICT r1 #8).
"""
from __future__ import annotations

import os
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.film_grain import FilmGrainData, H274GrainData

__all__ = ["generate_grain_db", "apply_h274_grain", "needs_fg_h274"]

_DB_SLICES = 13


def needs_fg_h274(data: Optional[FilmGrainData]) -> bool:
    if data is None or data.type != "h274" or data.h274 is None:
        return False
    return any(data.h274.component_model_present)


@lru_cache(maxsize=1)
def _tables():
    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "h274_tables.npz")
    z = np.load(os.path.abspath(path))
    return (z["gaussian"].astype(np.int32), z["seed"].astype(np.uint64),
            z["r64t"].astype(np.int64))


def _prng_shift(state: int) -> int:
    feedback = 1 ^ (state >> 2) ^ (state >> 30)
    return ((state << 1) | (feedback & 1)) & 0xFFFFFFFF


def _generate_slice(h: int, v: int) -> np.ndarray:
    """One 64x64 grain slice (reference generate_slice,
    film_grain_h274.c:28-105): sparse random frequency coefficients,
    inverse R64 transform both axes, deblocking rows."""
    gauss, seed_lut, r64t = _tables()
    freq_h = ((h + 3) << 2) - 1
    freq_v = ((v + 3) << 2) - 1
    seed = int(seed_lut[h + v * 13])

    grain = np.zeros((64, 64), np.int64)       # indexed [x][y] like ref
    for y in range(freq_v + 1):
        for x in range(0, freq_h + 1, 4):
            offset = seed % 2048
            grain[x:x + 4, y] = gauss[offset:offset + 4]
            seed = _prng_shift(seed)
    grain[0][0] = 0

    # tmp[y][x] = sum_p R64T[y][p] * grain[x][p]  (inverse transform v)
    tmp = (grain[:, :freq_v + 1] @ r64t[:, :freq_v + 1].T).T  # (y64, x64)
    tmp = (tmp + 128) >> 8
    # grain[y][x] = sum_p tmp[y][p] * R64T[x][p]
    out = tmp[:, :freq_h + 1] @ r64t[:, :freq_h + 1].T
    out = np.clip((out + 128) >> 8, -127, 127).astype(np.float64)

    deblock_factors = np.array([64, 71, 77, 84, 90, 96, 103, 109, 116,
                                122, 128, 128, 128], np.int64)
    dc = int(deblock_factors[v])
    res = out.copy()
    for y in range(64):
        if y % 8 in (0, 7):
            res[y] = (out[y].astype(np.int64) * dc) >> 7
    return (res / 255.0).astype(np.float32)


@lru_cache(maxsize=1)
def generate_grain_db() -> np.ndarray:
    """The full (13*64, 13*64) grain database, laid out exactly like the
    reference's fill_grain_lut (film_grain_h274.c:108-126): slice (h, v)
    content [y][x] occupies rows [64h:64h+64), cols [64v:64v+64).
    (NB the fetch side indexes rows by v and cols by h — the reference
    has the same fill/fetch orientation quirk; we reproduce both sides
    verbatim so outputs match.)"""
    db = np.zeros((_DB_SLICES * 64, _DB_SLICES * 64), np.float32)
    for hh in range(_DB_SLICES):
        for v in range(_DB_SLICES):
            db[64 * hh:64 * hh + 64, 64 * v:64 * v + 64] = \
                _generate_slice(hh, v)
    return db


def _pcg3d(seed, wx, wy):
    """PCG3D hash (reference GLSL, film_grain_h274.c:164-176); uint32."""
    x = jnp.uint32(seed) * jnp.ones_like(wx, jnp.uint32)
    y = wx.astype(jnp.uint32)
    z = wy.astype(jnp.uint32)
    x = x * jnp.uint32(1664525) + jnp.uint32(1013904223)
    y = y * jnp.uint32(1664525) + jnp.uint32(1013904223)
    z = z * jnp.uint32(1664525) + jnp.uint32(1013904223)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    x = x ^ (x >> 16)
    y = y ^ (y >> 16)
    z = z ^ (z >> 16)
    x = x + y * z
    y = y + z * x
    z = z + x * y
    return x, y, z


_TILE_COLS = 0   # set by _aligned_tile_stack


@lru_cache(maxsize=1)
def _aligned_tile_stack() -> np.ndarray:
    """All 8-row/4-col aligned 8x8 tiles of the grain DB as one stack
    (rows x cols = 104 x 207), enabling the AV1-style whole-tile gather:
    tile t = (oy//8) * 207 + (ox//4)."""
    global _TILE_COLS
    db = generate_grain_db()
    win = np.lib.stride_tricks.sliding_window_view(db, (8, 8))
    tiles = win[::8, ::4]                    # (104, 207, 8, 8)
    _TILE_COLS = tiles.shape[1]
    return np.ascontiguousarray(
        tiles.reshape(-1, 8, 8).astype(np.float32))


def apply_h274_grain(img, data: FilmGrainData, channels: Tuple[int, ...],
                     is_ycbcr: bool = True, row0=None):
    """Apply H.274 grain to (..., C, H, W) [0,1] plane values.

    `row0` (traced ok): global row of img's first row when img is one
    row-shard of the frame — the PCG macroblock seeds and sub-tile
    offsets then use global block coordinates, so the sharded result
    equals the single-chip one (requires row0 % 8 == 0; blocks are
    8x8 and never span shards)."""
    d = data.h274
    H, W = img.shape[-2], img.shape[-1]
    tiles_j = jnp.asarray(_aligned_tile_stack())
    scale_factor = 1.0 / (1 << (d.log2_scale_factor + 6))

    nbx = (W + 7) // 8
    nby = (H + 7) // 8
    Hp, Wp = nby * 8, nbx * 8
    pad = [(0, 0)] * (img.ndim - 2) + [(0, Hp - H), (0, Wp - W)]
    x = jnp.pad(img, pad)

    by0 = 0 if row0 is None else row0 // 8
    brows = by0 + jnp.arange(nby, dtype=jnp.int32)   # global block rows
    # workgroup (8x8 block) grid; PCG seeded by (seed, wg/2)
    wx = jnp.arange(nbx, dtype=jnp.uint32)[None, :] // 2
    wy = (brows.astype(jnp.uint32) // 2)[:, None]
    wx = jnp.broadcast_to(wx, (nby, nbx))
    wy = jnp.broadcast_to(wy, (nby, nbx))
    pcg = _pcg3d(data.seed & 0xFFFFFFFF, wx, wy)

    # per-block average per channel (the reference's workgroup reduction)
    tiles = x.reshape(*x.shape[:-2], nby, 8, nbx, 8)
    avg = tiles.mean(axis=(-3, -1))                      # (..., C, nby, nbx)

    out_comps = []
    for ci, ch in enumerate(channels):
        comp = x[..., ci, :, :]
        if not d.component_model_present[ch]:
            out_comps.append(comp)
            continue
        cavg = avg[..., ci, :, :]

        # intensity interval -> packed (scale, h, v); masked select
        val_scale = jnp.zeros((nby, nbx), jnp.float32)
        val_h = jnp.zeros((nby, nbx), jnp.int32)
        val_v = jnp.zeros((nby, nbx), jnp.int32)
        hit = jnp.zeros((nby, nbx), bool)
        n_int = d.num_intensity_intervals[ch]
        nmv = d.num_model_values[ch]
        for i in range(n_int):
            lo = d.intensity_interval_lower_bound[ch][i] / 255.0
            hi = d.intensity_interval_upper_bound[ch][i] / 255.0
            mv = d.comp_model_value[ch][i]
            hh = int(np.clip(mv[1] if nmv > 1 else 8, 2, 14)) - 2
            vv = int(np.clip(mv[2] if nmv > 2 else (mv[1] if nmv > 1 else 8),
                             2, 14)) - 2
            scale = int(mv[0])
            if ch > 0 and is_ycbcr:
                scale >>= 1
            m = (cavg >= lo) & (cavg <= hi) & ~hit
            val_scale = jnp.where(m, scale * scale_factor, val_scale)
            val_h = jnp.where(m, hh, val_h)
            val_v = jnp.where(m, vv, val_v)
            hit = hit | m
        # (reference packs val = scale<<16 | h<<8 | v, 0 when no interval)
        val_scale = jnp.where(hit, val_scale, 0.0)

        # offsets (reference film_grain_h274.c:230-242):
        # offset.x = (h*64 + intra-slice jitter), offset.y likewise
        rand = pcg[ch]
        ox = (val_h * 64 + ((rand >> 16) % 52).astype(jnp.int32)) & ~3
        oy = (val_v * 64 + (rand & 0xFFFF).astype(jnp.int32) % 56) & ~7
        sign = jnp.where((rand & 1) == 1, -1.0, 1.0)
        # 8 * (wg % 2) sub-offset (adjacent blocks use adjacent sub-tiles)
        ox = ox + 8 * (jnp.arange(nbx, dtype=jnp.int32)[None, :] % 2)
        oy = oy + 8 * (brows % 2)[:, None]

        # whole-tile gather (AV1 pattern): oy is 8-aligned and ox is
        # 4-aligned by construction, so each block's 8x8 grain slice is
        # one row of the precomputed aligned-tile stack — a single
        # contiguous take per block instead of 64 scattered texels
        tile_idx = (oy >> 3) * _TILE_COLS + (ox >> 2)
        grain = jnp.take(tiles_j, tile_idx.reshape(-1), axis=0)
        grain = grain.reshape(nby, nbx, 8, 8)
        grain = grain * (val_scale * sign)[:, :, None, None]
        grain_img = grain.transpose(0, 2, 1, 3).reshape(Hp, Wp)
        out_comps.append(comp + grain_img)

    out = jnp.stack(out_comps, axis=-3)
    return jnp.clip(out[..., :H, :W], 0.0, 1.0)
