"""Color decoding/encoding & (de)linearization on device.

TPU-native rebuild of the reference's color shaders
(src/shaders/colorspace.c: pl_shader_decode_color:275, encode_color:462,
linearize:589, delinearize:722, sigmoidize/unsigmoidize:851+).  All
functions take/return planar float32 images of shape (..., C, H, W) and
are fully traceable; ColorRepr/ColorSpace metadata are *static* arguments
baked into the trace (the jit cache in graph/ keys on them, playing the
role of the reference's pass signature cache).

Scale convention: linear light is NORM (1.0 = 203 nits SDR white).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core import transfer as tf
from ..core.colorspace import (COLOR_SDR_WHITE, ColorPrimaries, ColorRepr,
                               ColorSpace, ColorSystem, ColorTransfer,
                               color_repr_decode, ictcp_matrices, luma_coeffs,
                               primaries_get, transfer_is_hdr)

__all__ = [
    "apply_matrix", "decode_color", "encode_color", "linearize",
    "delinearize", "sigmoidize", "desigmoidize", "nominal_luma_norm",
    "SigmoidParams", "cone_distort", "extract_features",
]


def cone_distort(img, csp: ColorSpace, params, already_linear=False):
    """Color-blindness simulation/adaptation (reference
    pl_shader_cone_distort, shaders/colorspace.c:2040): apply the cone
    deficiency matrix in linear light.  With `already_linear`, the
    surrounding linearize/delinearize round trip is skipped (the renderer
    calls this inside its linear-light section)."""
    from ..core.colorspace import Cone, cone_matrix
    if params is None or Cone(params.cones) == Cone.NONE:
        return img
    m = cone_matrix(params, primaries_get(csp.infer().primaries))
    if already_linear:
        return apply_matrix(img, m.m)
    return delinearize(apply_matrix(linearize(img, csp), m.m), csp)

_HLG_REF = 1000.0 / COLOR_SDR_WHITE
_SCRGB_WHITE = 80.0 / COLOR_SDR_WHITE

# Rec. BT.2020-2 OETF constants (12-bit exact values); used only by the
# constant-luminance system's spec-mandated gamma roundtrip.
_B2020_A = 1.0993
_B2020_B = 0.0181


def _bt2020_oetf(l):
    l = jnp.maximum(l, 0.0)
    return jnp.where(l < _B2020_B, 4.5 * l,
                     _B2020_A * tf.pow_pos(l, 0.45) - (_B2020_A - 1.0))


def _bt2020_eotf(e):
    e = jnp.maximum(e, 0.0)
    return jnp.where(e < 4.5 * _B2020_B, e / 4.5,
                     tf.pow_pos((e + _B2020_A - 1.0) / _B2020_A, 1.0 / 0.45))


def apply_matrix(img, mat: np.ndarray, bias: Optional[np.ndarray] = None):
    """out[c] = sum_k mat[c,k] * img[k] (+ bias[c]); img (..., C, H, W).

    Deliberately *unrolled* into per-channel FMAs rather than einsum/dot:
    XLA lowers a channel dot to an MXU matmul with bf16 converts and
    layout copies, which splits the surrounding elementwise chain into
    separate HBM passes — at 4K each extra pass is ~1 ms of pure
    bandwidth.  The unrolled form stays inside one loop fusion."""
    return mat_pointwise(img, np.asarray(mat, dtype=np.float64),
                         None if bias is None else np.asarray(bias))


# Channel-mix lowering: "unrolled" per-channel FMAs (exact f32, fuses
# into the surrounding elementwise chain).  HISTORY: "einsum" used to
# measure fastest (88.0 vs 84.9 fps, r2) — but that einsum silently ran
# the MXU dot in bf16, quantizing every channel mix to 8 mantissa bits
# (caught end-to-end as exact n/256 outputs).  With an honest
# precision="highest" einsum the ranking flips: unrolled 126.3 fps vs
# einsum 124.0 (r2-end).  Both forms are now exact; the env switch
# remains for experiments.
import contextlib as _contextlib
import os as _os
_MAT_IMPL = _os.environ.get("LPTPU_MAT_IMPL", "unrolled")


@_contextlib.contextmanager
def mat_impl(impl: str):
    """Temporarily force a channel-mix lowering.  Used while tracing
    Pallas kernel bodies: Mosaic has no einsum lowering for the tiny
    (3, K) channel dots, but the unrolled FMA form fuses perfectly."""
    global _MAT_IMPL
    prev = _MAT_IMPL
    _MAT_IMPL = impl
    try:
        yield
    finally:
        _MAT_IMPL = prev


def mat_pointwise(img, mat, bias=None):
    """Channel mix as fused elementwise math. mat (C, K) — numpy (host
    constants, zeros skipped) or a traced jnp array; img (..., K, H, W)."""
    if _MAT_IMPL == "einsum":
        m = jnp.asarray(np.asarray(mat, np.float32)) \
            if not isinstance(mat, jnp.ndarray) else mat
        # precision=highest is NOT optional: the default TPU einsum runs
        # the MXU dot in bf16, silently quantizing every channel mix to
        # 8 mantissa bits (caught as exact n/256 outputs end-to-end)
        out = jnp.einsum("ck,...khw->...chw", m, img,
                         precision="highest")
        if bias is not None:
            b = bias if isinstance(bias, jnp.ndarray) else \
                jnp.asarray(np.asarray(bias, np.float32))
            out = out + b.reshape(-1, 1, 1)
        return out
    if _MAT_IMPL == "bcast":
        m = jnp.asarray(np.asarray(mat, np.float32)) \
            if not isinstance(mat, jnp.ndarray) else mat
        out = jnp.sum(m[:, :, None, None] *
                      img[..., None, :, :, :], axis=-3)
        if bias is not None:
            b = bias if isinstance(bias, jnp.ndarray) else \
                jnp.asarray(np.asarray(bias, np.float32))
            out = out + b.reshape(-1, 1, 1)
        return out
    traced = isinstance(mat, jnp.ndarray)
    C = mat.shape[0]
    K = mat.shape[1]
    chans = []
    for c in range(C):
        acc = None
        for k in range(K):
            if traced:
                w = mat[c, k]
            else:
                w = float(mat[c, k])
                if w == 0.0:
                    continue
            term = img[..., k, :, :] * w
            acc = term if acc is None else acc + term
        if acc is None:
            acc = jnp.zeros_like(img[..., 0, :, :])
        if bias is not None:
            b = bias[c] if traced or isinstance(bias, jnp.ndarray) \
                else float(bias[c])
            if traced or isinstance(bias, jnp.ndarray) or b != 0.0:
                acc = acc + b
        chans.append(acc)
    return jnp.stack(chans, axis=-3)


def nominal_luma_norm(csp: ColorSpace) -> Tuple[float, float]:
    """(min, max) display luminance in NORM units (reference
    pl_color_space_nominal_luma_ex with HDR10 metadata)."""
    inf = csp.infer()
    return (inf.hdr.min_luma / COLOR_SDR_WHITE,
            inf.hdr.max_luma / COLOR_SDR_WHITE)


# ---------------------------------------------------------------------------
# Decode / encode (reference pl_shader_decode_color / encode_color)
# ---------------------------------------------------------------------------

def decode_color(img, repr: ColorRepr,
                 prim: ColorPrimaries = ColorPrimaries.UNKNOWN,
                 dovi_packed=None, adjustment=None):
    """Encoded (sampled, normalized) planes -> full-range RGB [0,1].

    Handles the linear matrix systems via the host-computed transform
    (core.colorspace.color_repr_decode) plus the non-linear post-steps for
    ICtCp (PQ/HLG), BT.2020-C, and XYZ/ST428, mirroring
    pl_shader_decode_color (shaders/colorspace.c:275).
    """
    sys = repr.sys

    if sys == ColorSystem.XYZ:
        # ST 428 linearization then XYZ->RGB with the target primaries
        tr, _ = color_repr_decode(repr, prim, adjustment)
        img = apply_matrix(img, tr.mat.m, tr.c)
        img = (52.37 / 48.0) * tf.pow_pos(jnp.maximum(img, 0.0), 2.6)
        from ..core.colorspace import xyz_to_rgb_matrix
        rgb_m = xyz_to_rgb_matrix(primaries_get(prim)).m
        img = apply_matrix(img, rgb_m)
        # renormalize: back to gamma light (reference keeps XYZ linear
        # until linearize; we return "linearized" flag separately — for
        # simplicity we re-encode with gamma 2.6 so downstream linearize
        # applies uniformly)
        img = tf.pow_pos(jnp.maximum(img / (52.37 / 48.0), 0.0), 1 / 2.6)
        return img

    if sys in (ColorSystem.BT_2100_PQ, ColorSystem.BT_2100_HLG):
        # ICtCp -> L'M'S' (linear part) -> LMS -> RGB(2020).
        # Container transforms use the *exact* PQ curves: they run once
        # per frame at the pipeline boundary, and the pow-free fast
        # approximations clamp the near-black toe (<0.001 nits), which
        # would break encode<->decode round trips.
        tr, _ = color_repr_decode(repr, prim, adjustment)
        lmsp = apply_matrix(img, tr.mat.m, tr.c)
        rgb2lms, _ = ictcp_matrices(sys)
        lms2rgb = np.linalg.inv(rgb2lms)
        if sys == ColorSystem.BT_2100_PQ:
            lms = tf.pq_eotf(lmsp)
            rgb = apply_matrix(lms, lms2rgb)
            return tf.pq_oetf(jnp.maximum(rgb, 0.0))
        else:
            lms = tf.hlg_oetf_inv(lmsp) / 12.0
            rgb = apply_matrix(lms, lms2rgb)
            return tf.hlg_oetf(jnp.maximum(rgb, 0.0) * 12.0)

    if sys == ColorSystem.DOLBYVISION:
        # reshape -> nonlinear YCC->RGB matrix -> PQ linearize -> linear
        # (LMS->RGB) matrix -> back to PQ-encoded RGB so the uniform
        # linearize step downstream applies (reference: decode applies
        # reshape+nonlinear, linearize applies eotf+linear matrix).
        # With `dovi_packed` every RPU coefficient is a traced array —
        # per-frame RPUs swap data without recompiling.
        from . import dovi as ops_dovi
        if dovi_packed is not None:
            img = ops_dovi.dovi_reshape_packed(img, dovi_packed)
            off = dovi_packed.nonlinear @ dovi_packed.nonlinear_off
            img = mat_pointwise(img, dovi_packed.nonlinear) \
                - off[:, None, None]
            lms = tf.pq_eotf_fast(jnp.maximum(img, 0.0))
            rgb = mat_pointwise(lms, dovi_packed.linear)
            return tf.pq_oetf_fast(jnp.maximum(rgb, 0.0))
        img = ops_dovi.dovi_reshape(img, repr.dovi)
        tr, _ = color_repr_decode(repr, prim, adjustment)
        img = apply_matrix(img, tr.mat.m, tr.c)
        lms = tf.pq_eotf_fast(jnp.maximum(img, 0.0))
        linear_m = np.asarray(repr.dovi.linear, np.float64).reshape(3, 3)
        rgb = apply_matrix(lms, linear_m)
        return tf.pq_oetf_fast(jnp.maximum(rgb, 0.0))

    if sys == ColorSystem.BT_2020_C:
        # Exact constant-luminance decode (Rec. BT.2020-2 table 4;
        # reference pl_shader_decode_color, shaders/colorspace.c:354-392):
        # expand range, rebuild B'/R' around gamma-luma with the piecewise
        # chroma denominators, then recover G through linear light using
        # the BT.2020 OETF roundtrip.
        tr, _ = color_repr_decode(repr, prim, adjustment)  # range only
        ycc = apply_matrix(img, tr.mat.m, tr.c)
        yp = ycc[..., 0, :, :]
        cb = ycc[..., 1, :, :]
        cr = ycc[..., 2, :, :]
        bp = yp + cb * jnp.where(cb <= 0, 1.9404, 1.5816)
        rp = yp + cr * jnp.where(cr <= 0, 1.7184, 0.9936)
        yl = _bt2020_eotf(yp)
        bl = _bt2020_eotf(bp)
        rl = _bt2020_eotf(rp)
        gl = (yl - 0.2627 * rl - 0.0593 * bl) / 0.6780
        gp = _bt2020_oetf(gl)
        return jnp.stack([rp, gp, bp], axis=-3)

    tr, _ = color_repr_decode(repr, prim, adjustment)
    out = apply_matrix(img, tr.mat.m, tr.c)
    return _apply_gamma(out, adjustment)


def _apply_gamma(img, adjustment):
    """Aesthetic gamma, applied in non-linear light at the end of the
    decode like the reference (shaders/colorspace.c:440-456)."""
    if adjustment is None or adjustment.gamma == 1.0:
        return img
    if adjustment.gamma == 0.0:
        return jnp.zeros_like(img)
    return tf.pow_pos(jnp.maximum(img, 0.0), 1.0 / adjustment.gamma)


def encode_color(img, repr: ColorRepr,
                 prim: ColorPrimaries = ColorPrimaries.UNKNOWN):
    """Full-range RGB -> encoded representation (inverse of decode_color;
    reference pl_shader_encode_color, shaders/colorspace.c:462)."""
    sys = repr.sys
    if sys in (ColorSystem.BT_2100_PQ, ColorSystem.BT_2100_HLG):
        # inverse of the ICtCp decode: (PQ/HLG)-encoded RGB -> LMS ->
        # L'M'S' -> ICtCp -> range compression
        rgb2lms, _ = ictcp_matrices(sys)
        if sys == ColorSystem.BT_2100_PQ:
            lms = apply_matrix(tf.pq_eotf(img), rgb2lms)
            lmsp = tf.pq_oetf(jnp.maximum(lms, 0.0))
        else:
            lms = apply_matrix(tf.hlg_oetf_inv(img) / 12.0, rgb2lms)
            lmsp = tf.hlg_oetf(jnp.maximum(lms, 0.0) * 12.0)
        tr, _ = color_repr_decode(repr, prim)
        inv = tr.invert()
        return apply_matrix(lmsp, inv.mat.m, inv.c)
    if sys == ColorSystem.XYZ:
        # inverse of the ST 428 decode: gamma-2.6 RGB -> linear ->
        # RGB->XYZ -> DCDM encode -> range compression
        from ..core.colorspace import rgb_to_xyz_matrix
        lin = (52.37 / 48.0) * tf.pow_pos(jnp.maximum(img, 0.0), 2.6)
        xyz = apply_matrix(lin, rgb_to_xyz_matrix(primaries_get(prim)).m)
        sig = tf.pow_pos(jnp.maximum(xyz / (52.37 / 48.0), 0.0), 1 / 2.6)
        tr, _ = color_repr_decode(repr, prim)
        inv = tr.invert()
        return apply_matrix(sig, inv.mat.m, inv.c)
    if sys == ColorSystem.BT_2020_C:
        # inverse of the constant-luminance decode (Rec. BT.2020-2)
        r = img[..., 0, :, :]
        g = img[..., 1, :, :]
        b = img[..., 2, :, :]
        yl = (0.2627 * _bt2020_eotf(r) + 0.6780 * _bt2020_eotf(g) +
              0.0593 * _bt2020_eotf(b))
        yp = _bt2020_oetf(yl)
        db = b - yp
        dr = r - yp
        cb = db / jnp.where(db <= 0, 1.9404, 1.5816)
        cr = dr / jnp.where(dr <= 0, 1.7184, 0.9936)
        ycc = jnp.stack([yp, cb, cr], axis=-3)
        tr, _ = color_repr_decode(repr, prim)
        inv = tr.invert()
        return apply_matrix(ycc, inv.mat.m, inv.c)
    tr, _ = color_repr_decode(repr, prim)
    inv = tr.invert()
    return apply_matrix(img, inv.mat.m, inv.c)


# ---------------------------------------------------------------------------
# Linearize / delinearize (reference pl_shader_linearize:589)
# ---------------------------------------------------------------------------

def linearize(img, csp: ColorSpace):
    """Signal -> linear light (NORM), with black-point/peak scaling from
    the colorspace's nominal luminance — exact reference semantics."""
    trc = csp.infer().transfer
    if trc == ColorTransfer.LINEAR:
        return img
    lo, hi = nominal_luma_norm(csp)

    if trc != ColorTransfer.SCRGB:
        img = jnp.maximum(img, 0.0)

    if trc == ColorTransfer.BT_1886:
        lb = lo ** (1 / 2.4)
        lw = hi ** (1 / 2.4)
        a = (lw - lb) ** 2.4
        b = lb / (lw - lb)
        return a * tf.pow_pos(img + b, 2.4)
    if trc == ColorTransfer.PQ:
        return tf.pq_eotf_fast(img) * (10000.0 / COLOR_SDR_WHITE)
    if trc == ColorTransfer.HLG:
        y = 1.2 * math.pow(1.111, math.log2(hi / _HLG_REF))
        b = math.sqrt(3 * math.pow(lo / hi, 1 / y))
        # OETF^-1 with black lift
        e = (1 - b) * img + b
        scene = tf.hlg_oetf_inv(e) / 12.0
        # OOTF: luma-dependent gamma
        lw_ = jnp.asarray(luma_coeffs(primaries_get(
            csp.infer().primaries)).astype(np.float32))
        luma = (lw_[0] * scene[..., 0, :, :] + lw_[1] * scene[..., 1, :, :]
                + lw_[2] * scene[..., 2, :, :])[..., None, :, :]
        return hi * scene * tf.pow_pos(jnp.maximum(luma, 0.0), y - 1)
    if trc == ColorTransfer.SCRGB:
        return img * _SCRGB_WHITE

    lin = tf.linearize(img, trc)
    # "black scaled" SDR curves stretch into [lo, hi]; the V-Log/S-Log
    # camera curves are scene-referred and take NO display scaling
    # (reference pl_shader_linearize returns before scale_out for them,
    # shaders/colorspace.c:688-705)
    if trc in (ColorTransfer.V_LOG, ColorTransfer.S_LOG1,
               ColorTransfer.S_LOG2):
        return lin
    if hi != 1.0 or lo != 0.0:
        lin = (hi - lo) * lin + lo
    return lin


def delinearize(img, csp: ColorSpace):
    """Linear light (NORM) -> signal. Inverse of `linearize`
    (reference pl_shader_delinearize:722)."""
    trc = csp.infer().transfer
    if trc == ColorTransfer.LINEAR:
        return img
    lo, hi = nominal_luma_norm(csp)

    if trc not in (ColorTransfer.PQ, ColorTransfer.HLG, ColorTransfer.SCRGB,
                   ColorTransfer.BT_1886, ColorTransfer.V_LOG,
                   ColorTransfer.S_LOG1, ColorTransfer.S_LOG2):
        # undo black scaling first (not for the scene-referred log
        # curves — reference pl_shader_delinearize scale_in skip,
        # shaders/colorspace.c:735-760)
        if hi != 1.0 or lo != 0.0:
            img = (img - lo) / (hi - lo)

    if trc != ColorTransfer.SCRGB:
        img = jnp.maximum(img, 0.0)

    if trc == ColorTransfer.BT_1886:
        lb = lo ** (1 / 2.4)
        lw = hi ** (1 / 2.4)
        a = (lw - lb) ** 2.4
        b = lb / (lw - lb)
        return tf.pow_pos(jnp.maximum(img, 0.0) / a, 1 / 2.4) - b
    if trc == ColorTransfer.PQ:
        return tf.pq_oetf_fast(img * (COLOR_SDR_WHITE / 10000.0))
    if trc == ColorTransfer.HLG:
        y = 1.2 * math.pow(1.111, math.log2(hi / _HLG_REF))
        b = math.sqrt(3 * math.pow(lo / hi, 1 / y))
        disp = img / hi
        lw_ = jnp.asarray(luma_coeffs(primaries_get(
            csp.infer().primaries)).astype(np.float32))
        luma = (lw_[0] * disp[..., 0, :, :] + lw_[1] * disp[..., 1, :, :]
                + lw_[2] * disp[..., 2, :, :])[..., None, :, :]
        scene = 12.0 * disp * tf.pow_pos(jnp.maximum(luma, 1e-6),
                                        (1 - y) / y)
        e = tf.hlg_oetf(scene)
        return (e - b) / (1 - b)
    if trc == ColorTransfer.SCRGB:
        return img / _SCRGB_WHITE

    return tf.delinearize(img, trc)


# ---------------------------------------------------------------------------
# Sigmoidization (reference pl_shader_sigmoidize, shaders/colorspace.c:851)
# ---------------------------------------------------------------------------

class SigmoidParams:
    """Reference pl_sigmoid_params: defaults center=0.75, slope=6.5."""
    def __init__(self, center: float = 0.75, slope: float = 6.5):
        self.center = center
        self.slope = slope

    def key(self):
        return (self.center, self.slope)


DEFAULT_SIGMOID = SigmoidParams()


def sigmoidize(img, params: SigmoidParams = DEFAULT_SIGMOID):
    """Nonlinear [0,1] -> sigmoid domain, for ringing-resistant linear
    scaling. Passes through (0,0) and (1,1)."""
    center, slope = params.center, params.slope
    offset = 1.0 / (1 + math.exp(slope * center))
    scale = 1.0 / (1 + math.exp(slope * (center - 1))) - offset
    x = jnp.clip(img, 0.0, 1.0)
    return center - (1.0 / slope) * jnp.log(
        1.0 / (x * scale + offset) - 1.0)


def desigmoidize(img, params: SigmoidParams = DEFAULT_SIGMOID):
    center, slope = params.center, params.slope
    offset = 1.0 / (1 + math.exp(slope * center))
    scale = 1.0 / (1 + math.exp(slope * (center - 1))) - offset
    x = jnp.clip(img, 0.0, 1.0)
    return (1.0 / scale) / (1.0 + jnp.exp(slope * (center - x))) \
        - offset / scale


def extract_features(img, csp: ColorSpace, already_linear: bool = False):
    """Grayscale feature map for contrast recovery: the PQ-encoded IPT
    intensity I of the image (reference pl_shader_extract_features,
    shaders/colorspace.c:1383).  Input (..., 3, H, W) in `csp`'s signal
    encoding (or NORM-scaled linear light when `already_linear`);
    returns (..., 1, H, W)."""
    from ..core.gamut_mapping import LMS2IPT, ipt_rgb2lms
    from ..core.colorspace import primaries_get as _pget
    lin = img if already_linear else linearize(img, csp)
    rgb = lin[..., :3, :, :]
    # NORM (1.0 = 203 nits) -> 10k-normalized, through the IPT LMS matrix
    rgb2lms = ipt_rgb2lms(_pget(csp.primaries)) * (COLOR_SDR_WHITE / 10000.0)
    lms = mat_pointwise(rgb, rgb2lms)
    lmsp = tf.pq_oetf_fast(jnp.maximum(lms, 0.0))
    I = (LMS2IPT[0, 0] * lmsp[..., 0:1, :, :] +
         LMS2IPT[0, 1] * lmsp[..., 1:2, :, :] +
         LMS2IPT[0, 2] * lmsp[..., 2:3, :, :])
    return I
