"""Electro-optical transfer functions (EOTF/OETF) for all 17 transfer
characteristics the framework supports.

TPU-native rebuild of the linearize/delinearize math in the reference
(src/shaders/colorspace.c:589-851 and src/colorspace.c).  Unlike the
reference — which emits GLSL text per TRC — these are plain traceable
functions over jnp arrays; XLA fuses them into surrounding passes.  They
also accept numpy arrays (host-side LUT generation).

Scale convention (matches reference): *linear* values are in NORM units
where 1.0 == SDR reference white (203 cd/m²); PQ therefore linearizes to
[0, 10000/203 ≈ 49.26].  Black scaling/lifting for BT.1886 is handled by
the caller (ops.color.linearize) since it depends on HDR metadata.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import fastmath
from .colorspace import ColorTransfer, COLOR_SDR_WHITE

__all__ = [
    "pq_eotf", "pq_oetf", "hlg_oetf", "hlg_oetf_inv",
    "srgb_eotf", "srgb_oetf", "linearize", "delinearize",
    "TRANSFER_FUNCS", "pow_pos",
]


def pow_pos(x, p):
    """x**p for non-negative x, written as exp(p·log x) — which is what
    XLA lowers non-integer pow to anyway, and (unlike math.powf) has a
    Mosaic lowering, so the same TRC code traces inside Pallas kernels
    (ops.pallas.color_map).  x == 0 maps to ~0 for p > 0."""
    return jnp.exp(p * jnp.log(jnp.maximum(x, 1e-36)))

# ---------------------------------------------------------------------------
# PQ (SMPTE ST 2084 / BT.2100) — standard published constants
# ---------------------------------------------------------------------------
PQ_M1 = 2610.0 / 16384
PQ_M2 = 2523.0 / 4096 * 128
PQ_C1 = 3424.0 / 4096
PQ_C2 = 2413.0 / 4096 * 32
PQ_C3 = 2392.0 / 4096 * 32


def pq_eotf(x):
    """PQ signal [0,1] -> display-relative linear [0,1] (1.0 = 10000
    nits). The signal domain is clamped like the reference's (PQ is
    undefined past its own peak; extrapolating explodes on the
    super-range intermediates gamut math produces)."""
    x = jnp.clip(x, 0.0, 1.0)
    p = pow_pos(x, 1.0 / PQ_M2)
    num = jnp.maximum(p - PQ_C1, 0.0)
    den = PQ_C2 - PQ_C3 * p
    return pow_pos(num / den, 1.0 / PQ_M1)


def pq_oetf(y):
    """Linear [0,1] (1.0 = 10000 nits) -> PQ signal [0,1], domain
    clamped (see pq_eotf)."""
    y = jnp.clip(y, 0.0, 1.0)
    p = pow_pos(y, PQ_M1)
    return pow_pos((PQ_C1 + PQ_C2 * p) / (1.0 + PQ_C3 * p), PQ_M2)


# ---------------------------------------------------------------------------
# HLG (ARIB STD-B67 / BT.2100) — scene-referred, 0..12 range
# ---------------------------------------------------------------------------
HLG_A = 0.17883277
HLG_B = 0.28466892   # 1 - 4a
HLG_C = 0.55991073   # 0.5 - a*ln(4a)


def hlg_oetf_inv(x):
    """HLG signal [0,1] -> scene-linear [0,12]."""
    x = jnp.maximum(x, 0.0)
    lo = 4.0 * x * x
    hi = jnp.exp((x - HLG_C) / HLG_A) + HLG_B
    return jnp.where(x <= 0.5, lo, hi)


def hlg_oetf(y):
    """Scene-linear [0,12] -> HLG signal [0,1]."""
    y = jnp.maximum(y, 0.0)
    lo = 0.5 * jnp.sqrt(y)
    hi = HLG_A * jnp.log(jnp.maximum(y - HLG_B, 1e-9)) + HLG_C
    return jnp.where(y <= 1.0, lo, hi)


# ---------------------------------------------------------------------------
# sRGB (IEC 61966-2-1)
# ---------------------------------------------------------------------------

def srgb_eotf(x):
    x = jnp.asarray(x)
    return jnp.where(x < 0.04045, x / 12.92,
                     pow_pos((jnp.maximum(x, 0.04045) + 0.055) / 1.055, 2.4))


def srgb_oetf(y):
    y = jnp.asarray(y)
    return jnp.where(y < 0.0031308, y * 12.92,
                     1.055 * pow_pos(jnp.maximum(y, 0.0031308), 1.0 / 2.4) - 0.055)


# ---------------------------------------------------------------------------
# ProPhoto (ROMM)
# ---------------------------------------------------------------------------

def prophoto_eotf(x):
    x = jnp.asarray(x)
    return jnp.where(x < 0.03125, x / 16.0,
                     pow_pos(jnp.maximum(x, 0.03125), 1.8))


def prophoto_oetf(y):
    y = jnp.asarray(y)
    return jnp.where(y < 0.001953125, y * 16.0,
                     pow_pos(jnp.maximum(y, 0.001953125), 1.0 / 1.8))


# ---------------------------------------------------------------------------
# Panasonic V-Log (VARICAM reference manual)
# ---------------------------------------------------------------------------
VLOG_B = 0.00873
VLOG_C = 0.241514
VLOG_D = 0.598206


def vlog_eotf(x):
    x = jnp.asarray(x)
    lo = (x - 0.125) / 5.6
    hi = pow_pos(10.0, (x - VLOG_D) / VLOG_C) - VLOG_B
    return jnp.where(x < 0.181, lo, hi)


def vlog_oetf(y):
    y = jnp.asarray(y)
    lo = 5.6 * y + 0.125
    hi = VLOG_C * jnp.log10(jnp.maximum(y + VLOG_B, 1e-9)) + VLOG_D
    return jnp.where(y < 0.01, lo, hi)


# ---------------------------------------------------------------------------
# Sony S-Log1 / S-Log2 (Sony S-Log reference)
# ---------------------------------------------------------------------------

def slog1_eotf(x):
    x = jnp.asarray(x)
    return pow_pos(10.0, (x - 0.616596 - 0.03) / 0.432699) - 0.037584


def slog1_oetf(y):
    y = jnp.asarray(y)
    return (0.432699 * jnp.log10(jnp.maximum(y + 0.037584, 1e-9))
            + 0.616596 + 0.03)


def slog2_eotf(x):
    x = jnp.asarray(x)
    lo = (x - 0.030001222851889303) / 3.53881278538813
    hi = 219.0 * (pow_pos(10.0, ((x - 0.616596 - 0.03) / 0.432699))
                  - 0.037584) / 155.0
    return jnp.where(x < 0.030001222851889303, lo, hi)


def slog2_oetf(y):
    y = jnp.asarray(y)
    lo = y * 3.53881278538813 + 0.030001222851889303
    hi = (0.432699 * jnp.log10(jnp.maximum(
        155.0 * y / 219.0 + 0.037584, 1e-9)) + 0.616596 + 0.03)
    return jnp.where(y < 0.0, lo, hi)


# ---------------------------------------------------------------------------
# Generic dispatch
# ---------------------------------------------------------------------------

_PQ_SCALE = 10000.0 / COLOR_SDR_WHITE   # PQ peak in NORM units
_ST428_SCALE = 52.37 / 48.0             # DCDM constant (SMPTE ST 428-1)

_PURE_GAMMA = {
    ColorTransfer.GAMMA18: 1.8,
    ColorTransfer.GAMMA20: 2.0,
    ColorTransfer.GAMMA22: 2.2,
    ColorTransfer.GAMMA24: 2.4,
    ColorTransfer.GAMMA26: 2.6,
    ColorTransfer.GAMMA28: 2.8,
}


def linearize(x, trc: ColorTransfer):
    """Signal -> linear light in NORM units (1.0 == SDR white).

    Equivalent of the per-TRC branches in the reference's
    pl_shader_linearize (src/shaders/colorspace.c:589-720), minus the
    black-point lift for BT.1886 (applied by the caller with HDR metadata).
    HLG here applies the OOTF-less normalization: scene-linear/12 scaled to
    the nominal peak.
    """
    if trc in (ColorTransfer.LINEAR, ColorTransfer.UNKNOWN):
        return jnp.asarray(x)
    if trc == ColorTransfer.SCRGB:
        return jnp.asarray(x)  # already linear (extended range)
    if trc == ColorTransfer.SRGB:
        return srgb_eotf(x)
    if trc == ColorTransfer.BT_1886:
        # pure 2.4 power; black lift applied separately
        return pow_pos(jnp.maximum(jnp.asarray(x), 0.0), 2.4)
    if trc in _PURE_GAMMA:
        return pow_pos(jnp.maximum(jnp.asarray(x), 0.0), _PURE_GAMMA[trc])
    if trc == ColorTransfer.PRO_PHOTO:
        return prophoto_eotf(x)
    if trc == ColorTransfer.ST428:
        return _ST428_SCALE * pow_pos(jnp.maximum(jnp.asarray(x), 0.0), 2.6)
    if trc == ColorTransfer.PQ:
        return pq_eotf(x) * _PQ_SCALE
    if trc == ColorTransfer.HLG:
        # scene-linear [0,12] -> NORM with nominal peak 12/HLG_75
        from .colorspace import transfer_nominal_peak
        peak = transfer_nominal_peak(ColorTransfer.HLG)
        return hlg_oetf_inv(x) * (peak / 12.0)
    if trc == ColorTransfer.V_LOG:
        return vlog_eotf(x)
    if trc == ColorTransfer.S_LOG1:
        return slog1_eotf(x)
    if trc == ColorTransfer.S_LOG2:
        return slog2_eotf(x)
    raise ValueError(f"unsupported transfer {trc}")


def delinearize(y, trc: ColorTransfer):
    """Linear light (NORM units) -> signal. Inverse of `linearize`."""
    if trc in (ColorTransfer.LINEAR, ColorTransfer.UNKNOWN,
               ColorTransfer.SCRGB):
        return jnp.asarray(y)
    if trc == ColorTransfer.SRGB:
        return srgb_oetf(y)
    if trc == ColorTransfer.BT_1886:
        return pow_pos(jnp.maximum(jnp.asarray(y), 0.0), 1.0 / 2.4)
    if trc in _PURE_GAMMA:
        return pow_pos(jnp.maximum(jnp.asarray(y), 0.0),
                         1.0 / _PURE_GAMMA[trc])
    if trc == ColorTransfer.PRO_PHOTO:
        return prophoto_oetf(y)
    if trc == ColorTransfer.ST428:
        return pow_pos(jnp.maximum(jnp.asarray(y), 0.0) / _ST428_SCALE,
                         1.0 / 2.6)
    if trc == ColorTransfer.PQ:
        return pq_oetf(jnp.asarray(y) / _PQ_SCALE)
    if trc == ColorTransfer.HLG:
        from .colorspace import transfer_nominal_peak
        peak = transfer_nominal_peak(ColorTransfer.HLG)
        return hlg_oetf(jnp.asarray(y) * (12.0 / peak))
    if trc == ColorTransfer.V_LOG:
        return vlog_oetf(y)
    if trc == ColorTransfer.S_LOG1:
        return slog1_oetf(y)
    if trc == ColorTransfer.S_LOG2:
        return slog2_oetf(y)
    raise ValueError(f"unsupported transfer {trc}")


TRANSFER_FUNCS = {trc: (lambda x, t=trc: linearize(x, t),
                        lambda y, t=trc: delinearize(y, t))
                  for trc in ColorTransfer
                  if trc != ColorTransfer.UNKNOWN}


# ---------------------------------------------------------------------------
# Fast PQ (pow-free): TPU pow lowers to exp/log transcendentals, and the
# color pipeline evaluates PQ on full 4K frames several times. These
# variants use repeated square roots / squarings plus small minimax-ish
# polynomials — max abs error ~5e-6 PQ units (far below the 45 dB
# budget), ~3x cheaper on the VPU. Coefficients are fitted once at
# import (deterministic).
# ---------------------------------------------------------------------------

def _fit(xs, ys, deg):
    return np.polyfit(xs, ys, deg).astype(np.float32)


# oetf: p = y^M1 via u = y^(1/8), p = u * poly(u) where poly ~ u^(8*M1-1)
_U_GRID = np.linspace(0.13, 1.0, 4001)
_OETF_P_COEF = _fit(_U_GRID, _U_GRID ** (8 * PQ_M1 - 1), 10)
# tail: v^M2 = v^64 * v^8 * v^4 * v^2 * poly(v), poly ~ v^(M2-78)
_V_GRID = np.linspace(PQ_C1, (PQ_C1 + PQ_C2) / (1 + PQ_C3), 2001)
_OETF_T_COEF = _fit(_V_GRID, _V_GRID ** (PQ_M2 - 78), 4)
# eotf: p = x^(1/M2) via u = x^(1/64), p = poly(u) ~ u^(64/M2)
_U2_GRID = np.linspace(0.74, 1.0, 4001)
_EOTF_P_COEF = _fit(_U2_GRID, _U2_GRID ** (64 / PQ_M2), 6)
# eotf tail: r^(1/M1) = r^6 * s-poly with s = r^(1/8), poly ~ s^(8*(1/M1-6))
_S_GRID = np.linspace(0.0, 1.0, 4001)
_EOTF_T_COEF = _fit(_S_GRID, _S_GRID ** (8 * (1 / PQ_M1 - 6)), 8)


def _polyval(coef, x):
    out = None
    for c in coef:
        out = x * out + float(c) if out is not None else \
            jnp.full_like(x, float(c))
    return out


def pq_oetf_fast(y):
    """Pow-free pq_oetf; |err| < 5e-6 over [1e-7, 1]."""
    y = jnp.clip(y, 1e-7, 1.0)
    u = jnp.sqrt(jnp.sqrt(jnp.sqrt(y)))
    p = u * _polyval(_OETF_P_COEF, u)
    v = fastmath.fdiv(PQ_C1 + PQ_C2 * p, 1.0 + PQ_C3 * p)
    v2 = v * v
    v4 = v2 * v2
    v8 = v4 * v4
    v64 = ((v8 * v8) ** 2) ** 2
    return v64 * v8 * v4 * v2 * _polyval(_OETF_T_COEF, v)


def pq_eotf_fast(x):
    """Pow-free pq_eotf; relative err < 1e-5 over [0, 1]."""
    x = jnp.clip(x, 1e-8, 1.0)
    u = jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.sqrt(x))))))
    p = _polyval(_EOTF_P_COEF, u)
    r = fastmath.fdiv(jnp.maximum(p - PQ_C1, 0.0), PQ_C2 - PQ_C3 * p)
    s = jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.maximum(r, 0.0))))
    r2 = r * r
    return r2 * r2 * r2 * _polyval(_EOTF_T_COEF, s)
