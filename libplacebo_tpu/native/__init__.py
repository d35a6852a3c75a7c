"""Native (C++) host-side runtime components.

The reference implements its entire host runtime in C11; here the hot
host-side paths — currently AV1 film-grain table generation, whose AR
filtering is inherently sequential — are C++ behind a plain C ABI,
loaded with ctypes (~1000x the pure-Python speed, bit-exact).

The shared library is compiled on first use with the system toolchain
and cached next to this file; everything degrades gracefully to the
Python implementations when no compiler is available.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "available", "grain_y_native", "grain_uv_native",
           "grain_offsets_native", "blue_noise_native",
           "gamut_lut_native", "GAMUT_OP_IDS"]

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, f"_plnative_{sys.implementation.cache_tag}.so")
_SRCS = [os.path.join(_HERE, "grain.cc"),
         os.path.join(_HERE, "dither.cc"),
         os.path.join(_HERE, "gamut.cc")]

_lib = None
_tried = False
_lock = threading.Lock()


def _build() -> Optional[str]:
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", _SO_PATH] + _SRCS
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO_PATH
    except (subprocess.SubprocessError, OSError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        fresh = os.path.exists(_SO_PATH) and all(
            os.path.getmtime(_SO_PATH) >= os.path.getmtime(s)
            for s in _SRCS if os.path.exists(s))
        path = _SO_PATH if fresh else _build()
        if path is None:
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        c = ctypes
        lib.pl_av1_grain_y.argtypes = [
            i16p, c.c_uint32, c.c_int, c.c_int, c.c_int, i32p, c.c_int,
            f32p, i16p]
        lib.pl_av1_grain_uv.argtypes = [
            i16p, c.c_uint32, c.c_int, c.c_int, c.c_int, c.c_int, c.c_int,
            c.c_int, c.c_int, i32p, c.c_int, i16p, f32p]
        lib.pl_av1_grain_offsets.argtypes = [
            c.c_uint32, c.c_int, c.c_int, u32p]
        if hasattr(lib, "pl_blue_noise"):
            lib.pl_blue_noise.argtypes = [c.c_int, f32p]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        if hasattr(lib, "plg_gamut_generate"):
            lib.plg_gamut_generate.argtypes = [
                c.c_int, f64p, f64p, f64p, f64p, f64p,
                c.c_double, c.c_double, f64p,
                c.c_int, c.c_int, c.c_int, f32p]
            lib.plg_gamut_generate.restype = c.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def grain_y_native(gauss: np.ndarray, seed: int, bits: int,
                   grain_scale_shift: int, ar_coeff_lag: int,
                   ar_coeffs_y, ar_coeff_shift: int):
    lib = get_lib()
    if lib is None:
        return None
    lut = np.zeros((64, 64), np.float32)
    buf = np.zeros((73, 82), np.int16)
    coeffs = np.zeros(24, np.int32)
    cy = np.asarray(ar_coeffs_y, np.int32)
    coeffs[:len(cy)] = cy
    lib.pl_av1_grain_y(np.ascontiguousarray(gauss, np.int16),
                       seed & 0xFFFF, bits, grain_scale_shift,
                       ar_coeff_lag, coeffs, ar_coeff_shift, lut, buf)
    return lut, buf


def grain_uv_native(gauss: np.ndarray, seed: int, channel: int,
                    sub_x: int, sub_y: int, bits: int,
                    grain_scale_shift: int, num_points_y: int,
                    ar_coeff_lag: int, ar_coeffs_uv, ar_coeff_shift: int,
                    buf_y: np.ndarray):
    lib = get_lib()
    if lib is None:
        return None
    lutW = 64 >> sub_x
    lutH = 64 >> sub_y
    lut = np.zeros((lutH, lutW), np.float32)
    coeffs = np.zeros(25, np.int32)
    cu = np.asarray(ar_coeffs_uv, np.int32)
    coeffs[:len(cu)] = cu
    lib.pl_av1_grain_uv(np.ascontiguousarray(gauss, np.int16),
                        seed & 0xFFFF, channel, sub_x, sub_y, bits,
                        grain_scale_shift, num_points_y, ar_coeff_lag,
                        coeffs, ar_coeff_shift,
                        np.ascontiguousarray(buf_y, np.int16), lut)
    return lut


def grain_offsets_native(seed: int, blocks_w: int, blocks_h: int):
    lib = get_lib()
    if lib is None:
        return None
    out = np.zeros((blocks_h, blocks_w), np.uint32)
    lib.pl_av1_grain_offsets(seed & 0xFFFF, blocks_w, blocks_h, out)
    return out


def blue_noise_native(shift: int) -> Optional[np.ndarray]:
    """Void-and-cluster blue noise (dither.cc); None when unavailable."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pl_blue_noise"):
        return None
    size = 1 << shift
    out = np.zeros((size, size), np.float32)
    lib.pl_blue_noise(shift, out)
    return out


# operator ids shared with gamut.cc (enum Op)
GAMUT_OP_IDS = {
    "clip": 0, "perceptual": 1, "softclip": 2, "relative": 3,
    "saturation": 4, "absolute": 5, "desaturate": 6, "darken": 7,
    "highlight": 8, "linear": 9,
}


def gamut_lut_native(op_name: str, src_rgb2lms, src_lms2rgb,
                     dst_rgb2lms, dst_lms2rgb, adapt,
                     min_luma: float, max_luma: float, consts,
                     NI: int, NC: int, Nh: int) -> Optional[np.ndarray]:
    """Gamut-mapping 3DLUT generation (gamut.cc): the scalar per-entry
    rebuild with the reference's 1-item per-hue peak cache
    (gamut_mapping.c:263). Returns (Nh, NC, NI, 3) float32, or None
    when native code is unavailable or the operator is unknown."""
    lib = get_lib()
    op = GAMUT_OP_IDS.get(op_name)
    if lib is None or op is None or not hasattr(lib, "plg_gamut_generate"):
        return None
    out = np.zeros((Nh, NC, NI, 3), np.float32)

    def m9(x):
        return np.ascontiguousarray(np.asarray(x, np.float64).reshape(9))
    rc = lib.plg_gamut_generate(
        op, m9(src_rgb2lms), m9(src_lms2rgb), m9(dst_rgb2lms),
        m9(dst_lms2rgb), m9(adapt), float(min_luma), float(max_luma),
        np.ascontiguousarray(np.asarray(consts, np.float64).reshape(5)),
        NI, NC, Nh, out)
    return out if rc == 0 else None
