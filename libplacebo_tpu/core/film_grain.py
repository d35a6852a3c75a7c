"""AV1 film-grain synthesis: host-side table generation.

TPU-native rebuild of the CPU half of src/shaders/film_grain_av1.c
(generate_grain_y:303, generate_grain_uv:351, generate_offsets:434,
generate_scaling:468).  All tables follow the AV1 specification §7.18.3
bit-exactly: the LFSR random generator, gaussian sequence indexing, AR
filtering with fixed-point rounding, offset packing, and the
piecewise-linear scaling LUT's fixed-point delta arithmetic.

The gaussian sequence itself (2048 spec-mandated int16 values) is stored
as a binary asset (data/av1_gaussian_sequence.npy).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "AV1GrainData", "H274GrainData", "FilmGrainData",
    "generate_grain_y", "generate_grain_uv", "generate_offsets",
    "generate_scaling", "BLOCK_SIZE", "GRAIN_WIDTH_LUT", "GRAIN_HEIGHT_LUT",
]

BLOCK_SIZE = 32
SCALING_LUT_SIZE = 256
GRAIN_WIDTH = 82
GRAIN_HEIGHT = 73
GRAIN_WIDTH_LUT = 64
GRAIN_HEIGHT_LUT = 64
GRAIN_PAD_LUT = 9
SUB_GRAIN_WIDTH = 44
SUB_GRAIN_HEIGHT = 38
SUB_GRAIN_PAD_LUT = 6

_GAUSSIAN = None


def _gaussian_sequence() -> np.ndarray:
    global _GAUSSIAN
    if _GAUSSIAN is None:
        path = os.path.join(os.path.dirname(__file__), "..", "data",
                            "av1_gaussian_sequence.npy")
        _GAUSSIAN = np.load(os.path.abspath(path))
    return _GAUSSIAN


@dataclass(frozen=True)
class AV1GrainData:
    """Reference pl_av1_grain_data (shaders/film_grain.h:40-80)."""
    num_points_y: int = 0
    points_y: Tuple[Tuple[int, int], ...] = ()
    chroma_scaling_from_luma: bool = False
    num_points_uv: Tuple[int, int] = (0, 0)
    points_uv: Tuple[Tuple[Tuple[int, int], ...], ...] = ((), ())
    scaling_shift: int = 8
    ar_coeff_lag: int = 0
    ar_coeffs_y: Tuple[int, ...] = ()
    ar_coeffs_uv: Tuple[Tuple[int, ...], ...] = ((), ())
    ar_coeff_shift: int = 6
    grain_scale_shift: int = 0
    uv_mult: Tuple[int, int] = (0, 0)
    uv_mult_luma: Tuple[int, int] = (0, 0)
    uv_offset: Tuple[int, int] = (0, 0)
    overlap: bool = True


@dataclass(frozen=True)
class H274GrainData:
    """Reference pl_h274_grain_data (SMPTE RDD-5 / H.274 SEI)."""
    model_id: int = 0
    blending_mode_id: int = 0
    log2_scale_factor: int = 0
    component_model_present: Tuple[bool, bool, bool] = (False, False, False)
    num_intensity_intervals: Tuple[int, ...] = (0, 0, 0)
    num_model_values: Tuple[int, ...] = (0, 0, 0)
    intensity_interval_lower_bound: Tuple = ((), (), ())
    intensity_interval_upper_bound: Tuple = ((), (), ())
    comp_model_value: Tuple = ((), (), ())


@dataclass(frozen=True)
class FilmGrainData:
    """Reference pl_film_grain_data (film_grain.h:82-100)."""
    type: str = "av1"            # "av1" | "h274" | "none"
    seed: int = 0
    av1: Optional[AV1GrainData] = None
    h274: Optional[H274GrainData] = None

    def key(self):
        return (self.type, self.seed, self.av1, self.h274)


def _lcg(state: int, bits: int) -> Tuple[int, int]:
    """AV1 spec LFSR (reference get_random_number,
    film_grain_av1.c:221)."""
    bit = ((state >> 0) ^ (state >> 1) ^ (state >> 3) ^ (state >> 12)) & 1
    state = ((state >> 1) | (bit << 15)) & 0xFFFF
    return (state >> (16 - bits)) & ((1 << bits) - 1), state


def _round2(x: int, shift: int) -> int:
    if not shift:
        return x
    return (x + (1 << (shift - 1))) >> shift


def _grain_min_max(bits: int) -> Tuple[int, int]:
    center = 128 << (bits - 8)
    return -center, (256 << (bits - 8)) - 1 - center


@lru_cache(maxsize=32)
def generate_grain_y(data: AV1GrainData, seed: int, bits: int = 8,
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (lut (64,64) float32 normalized, raw int16 (73,82) buffer).
    The raw buffer feeds chroma generation.

    Dispatches to the native C++ implementation when available
    (libplacebo_tpu/native/grain.cc, bit-exact, ~1000x faster)."""
    gauss = _gaussian_sequence()
    from .. import native
    res = native.grain_y_native(gauss, seed, bits, data.grain_scale_shift,
                                data.ar_coeff_lag, data.ar_coeffs_y,
                                data.ar_coeff_shift)
    if res is not None:
        return res
    shift = 12 - bits + data.grain_scale_shift
    assert shift >= 0
    gmin, gmax = _grain_min_max(bits)

    state = seed & 0xFFFF
    buf = np.zeros((GRAIN_HEIGHT, GRAIN_WIDTH), np.int64)
    for y in range(GRAIN_HEIGHT):
        for x in range(GRAIN_WIDTH):
            r, state = _lcg(state, 11)
            buf[y][x] = _round2(int(gauss[r]), shift)

    ar_pad = 3
    lag = data.ar_coeff_lag
    if lag > 0:
        coeffs = np.asarray(data.ar_coeffs_y, np.int64)
        for y in range(ar_pad, GRAIN_HEIGHT):
            for x in range(ar_pad, GRAIN_WIDTH - ar_pad):
                s = 0
                ci = 0
                for dy in range(-lag, 1):
                    for dx in range(-lag, lag + 1):
                        if dx == 0 and dy == 0:
                            break
                        s += coeffs[ci] * buf[y + dy][x + dx]
                        ci += 1
                g = buf[y][x] + _round2(int(s), data.ar_coeff_shift)
                buf[y][x] = np.clip(g, gmin, gmax)

    grain_scale = 1.0 / ((1 << bits) - 1)
    lut = (buf[GRAIN_PAD_LUT:GRAIN_PAD_LUT + GRAIN_HEIGHT_LUT,
               GRAIN_PAD_LUT:GRAIN_PAD_LUT + GRAIN_WIDTH_LUT]
           * grain_scale).astype(np.float32)
    return lut, buf.astype(np.int16)


@lru_cache(maxsize=32)
def generate_grain_uv(data: AV1GrainData, seed: int, channel: int,
                      sub_x: int, sub_y: int, bits: int = 8) -> np.ndarray:
    """Chroma grain LUT for channel 1 (Cb) or 2 (Cr); shape
    (64>>sub_y, 64>>sub_x) float32."""
    gauss = _gaussian_sequence()
    shift = 12 - bits + data.grain_scale_shift
    gmin, gmax = _grain_min_max(bits)
    _, buf_y = generate_grain_y(data, seed, bits)

    from .. import native
    res = native.grain_uv_native(
        gauss, seed, channel, sub_x, sub_y, bits, data.grain_scale_shift,
        data.num_points_y, data.ar_coeff_lag,
        data.ar_coeffs_uv[channel - 1], data.ar_coeff_shift, buf_y)
    if res is not None:
        return res

    buf_y = buf_y.astype(np.int64)

    s = seed & 0xFFFF
    if channel == 1:
        s ^= 0xB524
    elif channel == 2:
        s ^= 0x49D8

    chromaW = SUB_GRAIN_WIDTH if sub_x else GRAIN_WIDTH
    chromaH = SUB_GRAIN_HEIGHT if sub_y else GRAIN_HEIGHT
    buf = np.zeros((GRAIN_HEIGHT, GRAIN_WIDTH), np.int64)
    state = s
    for y in range(chromaH):
        for x in range(chromaW):
            r, state = _lcg(state, 11)
            buf[y][x] = _round2(int(gauss[r]), shift)

    ar_pad = 3
    lag = data.ar_coeff_lag
    coeffs = np.asarray(data.ar_coeffs_uv[channel - 1], np.int64)
    if len(coeffs):
        for y in range(ar_pad, chromaH):
            for x in range(ar_pad, chromaW - ar_pad):
                ssum = 0
                ci = 0
                done = False
                for dy in range(-lag, 1):
                    if done:
                        break
                    for dx in range(-lag, lag + 1):
                        if dx == 0 and dy == 0:
                            if data.num_points_y:
                                luma = 0
                                lx = ((x - ar_pad) << sub_x) + ar_pad
                                ly = ((y - ar_pad) << sub_y) + ar_pad
                                for i in range(sub_y + 1):
                                    for j in range(sub_x + 1):
                                        luma += buf_y[ly + i][lx + j]
                                luma = _round2(int(luma), sub_x + sub_y)
                                ssum += luma * coeffs[ci]
                            done = True
                            break
                        ssum += coeffs[ci] * buf[y + dy][x + dx]
                        ci += 1
                g = buf[y][x] + _round2(int(ssum), data.ar_coeff_shift)
                buf[y][x] = np.clip(g, gmin, gmax)

    lutW = GRAIN_WIDTH_LUT >> sub_x
    lutH = GRAIN_HEIGHT_LUT >> sub_y
    padX = SUB_GRAIN_PAD_LUT if sub_x else GRAIN_PAD_LUT
    padY = SUB_GRAIN_PAD_LUT if sub_y else GRAIN_PAD_LUT
    grain_scale = 1.0 / ((1 << bits) - 1)
    return (buf[padY:padY + lutH, padX:padX + lutW]
            * grain_scale).astype(np.float32)


@lru_cache(maxsize=64)
def generate_offsets(seed: int, blocks_w: int, blocks_h: int) -> np.ndarray:
    """Per-block packed offsets (reference generate_offsets,
    film_grain_av1.c:434): uint32 = tl<<24 | t<<16 | l<<8 | n, each an
    8-bit random (hi nibble = x, lo nibble = y)."""
    from .. import native
    res = native.grain_offsets_native(seed, blocks_w, blocks_h)
    if res is not None:
        return res
    out = np.zeros((blocks_h, blocks_w), np.uint32)
    vals = np.zeros((blocks_h, blocks_w), np.uint32)
    for y in range(blocks_h):
        state = seed & 0xFFFF
        state ^= ((y * 37 + 178) & 0xFF) << 8
        state ^= (y * 173 + 105) & 0xFF
        for x in range(blocks_w):
            v, state = _lcg(state, 8)
            vals[y][x] = v
            vl = vals[y][x - 1] if x else 0
            vt = vals[y - 1][x] if y else 0
            vtl = vals[y - 1][x - 1] if x and y else 0
            out[y][x] = (np.uint32(vtl) << 24) | (np.uint32(vt) << 16) \
                | (np.uint32(vl) << 8) | np.uint32(v)
    return out


def generate_scaling(points: Tuple[Tuple[int, int], ...],
                     scaling_shift: int) -> np.ndarray:
    """256-entry piecewise-linear scaling LUT with the spec's fixed-point
    delta arithmetic (reference generate_scaling,
    film_grain_av1.c:468-497)."""
    data = np.zeros(SCALING_LUT_SIZE, np.float32)
    if not points:
        return data
    rng = float(1 << scaling_shift)
    pts = list(points)
    data[:pts[0][0]] = pts[0][1] / rng
    for i in range(len(pts) - 1):
        bx, by = pts[i]
        dx = pts[i + 1][0] - bx
        dy = pts[i + 1][1] - by
        delta = dy * ((0x10000 + (dx >> 1)) // dx)
        for x in range(dx):
            v = by + ((x * delta + 0x8000) >> 16)
            data[bx + x] = v / rng
    data[pts[-1][0]:] = pts[-1][1] / rng
    return data
