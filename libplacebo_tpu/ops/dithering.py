"""Dithering on device: ordered (blue noise / bayer LUT / fixed), white
noise, and error diffusion.

TPU-native rebuild of src/shaders/dithering.c: `pl_shader_dither` (:109)
becomes a tiled-LUT bias + quantize (with the reference's gamma-correct
low-depth path and temporal rotation), and the error-diffusion compute
pass (:326) becomes an anti-diagonal wavefront scan (see error_diffusion).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import dither as dth
from ..core.colorspace import ColorTransfer
from ..core.dither import DitherMethod, ErrorDiffusionKernel

__all__ = ["DitherParams", "dither", "error_diffusion"]


@dataclass(frozen=True)
class DitherParams:
    """Reference pl_dither_params (shaders/dithering.h)."""
    method: DitherMethod = DitherMethod.BLUE_NOISE
    lut_size: int = 6            # log2 of LUT dimension (64x64 default)
    temporal: bool = False
    transfer: ColorTransfer = ColorTransfer.UNKNOWN


# gamma approximations for gamma-correct low-depth dithering
# (reference approx_gamma, shaders/dithering.c:82-106)
_APPROX_GAMMA = {
    ColorTransfer.UNKNOWN: 1.0, ColorTransfer.LINEAR: 1.0,
    ColorTransfer.SCRGB: 1.0, ColorTransfer.PRO_PHOTO: 1.8,
    ColorTransfer.GAMMA18: 1.8, ColorTransfer.GAMMA20: 2.0,
    ColorTransfer.GAMMA24: 2.4, ColorTransfer.GAMMA26: 2.6,
    ColorTransfer.ST428: 2.6, ColorTransfer.GAMMA28: 2.8,
    ColorTransfer.SRGB: 2.2, ColorTransfer.BT_1886: 2.2,
    ColorTransfer.GAMMA22: 2.2,
    ColorTransfer.PQ: 2.0, ColorTransfer.HLG: 2.0,
    ColorTransfer.V_LOG: 2.0, ColorTransfer.S_LOG1: 2.0,
    ColorTransfer.S_LOG2: 2.0,
}


def _bias_matrix(params: DitherParams, h: int, w: int,
                 frame_index: int = 0) -> np.ndarray:
    """Host-side (h, w) bias pattern in [0,1): the dither LUT tiled over
    the image, with temporal rotation/mirroring every frame
    (reference dithering.c:185-204)."""
    if params.method == DitherMethod.WHITE_NOISE:
        rng = np.random.default_rng(0x9E3779B9 ^ frame_index)
        return rng.random((h, w), dtype=np.float32)

    if params.method == DitherMethod.ORDERED_FIXED:
        lut = dth.bayer_matrix(16)
    elif params.method == DitherMethod.ORDERED_LUT:
        lut = dth.bayer_matrix(1 << params.lut_size)
    else:  # BLUE_NOISE
        lut = dth.blue_noise(params.lut_size)

    if params.temporal:
        phase = frame_index % 8
        k = phase % 4
        lut = np.rot90(lut, k)
        if phase >= 4:
            lut = lut.T
    size = lut.shape[0]
    reps = (h + size - 1) // size, (w + size - 1) // size
    return np.tile(lut, reps)[:h, :w].astype(np.float32)


def dither(img, new_depth: int, params: Optional[DitherParams] = None,
           frame_index: int = 0, bias=None):
    """Quantize (..., C, H, W) [0,1] image to `new_depth` bits with dither
    bias (reference pl_shader_dither, shaders/dithering.c:109).

    For depths <= 4 with a known gamma, uses the reference's gamma-correct
    path (dither between linearized quantization levels).

    `bias` optionally injects a precomputed (h, w) bias block — used by
    the row-sharded multi-chip path, whose local block must see *its*
    rows of the frame-global bias pattern rather than a locally re-tiled
    one."""
    params = params or DitherParams()
    if new_depth <= 0 or new_depth > 16:
        return img
    h, w = img.shape[-2], img.shape[-1]
    if bias is None:
        bias = jnp.asarray(_bias_matrix(params, h, w, frame_index))
    scale = float((1 << new_depth) - 1)

    gamma = _APPROX_GAMMA.get(params.transfer, 1.0)
    if gamma != 1.0 and new_depth <= 4:
        color_lin = jnp.power(jnp.maximum(img, 0.0), gamma)
        if new_depth == 1:
            low = jnp.zeros_like(img)
            high = jnp.ones_like(img)
            offset = color_lin
        else:
            low = jnp.floor(img * scale) / scale
            high = jnp.ceil(img * scale) / scale
            low_lin = jnp.power(low, gamma)
            high_lin = jnp.power(high, gamma)
            offset = (color_lin - low_lin) / \
                jnp.maximum(high_lin - low_lin, 1e-6)
        return jnp.where(offset > bias, high, low)

    return jnp.floor(img * scale + bias) / scale


# ---------------------------------------------------------------------------
# Error diffusion (reference pl_shader_error_diffusion, dithering.c:326)
# ---------------------------------------------------------------------------

def error_diffusion(img, new_depth: int,
                    kernel: Optional[ErrorDiffusionKernel] = None):
    """Error-diffusion dither of (..., C, H, W) to `new_depth` bits.

    Dispatches to the Pallas wavefront kernel
    (ops.pallas.error_diffusion — ~7 ms/frame at 4K end-to-end with the
    Pallas shear kernels, vs 1.2 s for the lax.scan formulation below,
    bit-exact) with interpreter mode on CPU backends.  The scan
    implementation is retained as the cross-checking oracle.
    """
    import jax as _jax
    from .pallas.error_diffusion import error_diffusion_pallas
    interp = _jax.default_backend() == "cpu"
    return error_diffusion_pallas(img, new_depth, kernel,
                                  interpret=interp)


def error_diffusion_scan(img, new_depth: int,
                         kernel: Optional[ErrorDiffusionKernel] = None):
    """Reference lax.scan formulation (kept as the oracle for the Pallas
    kernel; see error_diffusion).

    The reference serializes the whole image through one compute pass
    parallelized along anti-diagonals (a wavefront with a shmem ring
    buffer).  Here: *shear* the image so the dependency wavefront becomes
    column-aligned, then `lax.scan` over the wavefront steps.

    The kernel's horizontal `shift` makes rows causally independent at an
    offset: pixel (y, x) only depends on (y-1, x+shift-1...) etc., so
    scanning columns of the sheared image x' = x + y*shift gives every
    in-flight row independence — the same trick as the reference
    (dithering.c:244-258 comments).
    """
    k = kernel or dth.ED_FLOYD_STEINBERG
    kern = np.asarray(k.pattern, dtype=np.float32) / k.divisor
    shift = k.shift
    *lead, H, W = img.shape
    scale = float((1 << new_depth) - 1)

    # sheared width: each row y is offset by y*shift columns
    Ws = W + (H - 1) * shift
    x = img.reshape((-1, H, W))
    C = x.shape[0]

    # Build sheared image: sheared[c, y, x + y*shift] = img[c, y, x]
    # Implemented via padding + per-row roll using gather indices.
    row_offsets = (np.arange(H) * shift)
    col_idx = (np.arange(Ws)[None, :] - row_offsets[:, None])  # (H, Ws)
    valid = (col_idx >= 0) & (col_idx < W)
    col_idx_c = np.clip(col_idx, 0, W - 1)
    gather_idx = jnp.asarray(col_idx_c)
    valid_j = jnp.asarray(valid.astype(np.float32))

    sheared = jnp.take_along_axis(
        x[:, :, :], jnp.broadcast_to(gather_idx, (C, H, Ws)), axis=2)
    sheared = sheared * valid_j

    # taps: (dy, dx) with weight, in original coordinates; in sheared
    # coords a tap (dy, dx) lands at column offset dx + dy*shift
    taps = []
    for dy in range(3):
        for dx in range(-2, 3):
            wgt = float(kern[dy, dx + 2])
            if wgt != 0.0:
                taps.append((dy, dx + dy * shift, wgt))
    max_off = max(off for _, off, _ in taps)

    # scan over sheared columns; carry = (C, H, max_off) sliding window of
    # pending error: slot j holds error landing j+1 columns ahead.
    def step(pending, xs):
        col, mask = xs           # (C, H), (H,)
        cur = col + pending[:, :, 0]
        quant = jnp.round(cur * scale) / scale
        # errors generated outside the valid (unsheared) image are dropped,
        # matching the sequential algorithm's row-edge behavior
        err = (cur - quant) * mask[None, :]
        new_pending = jnp.concatenate(
            [pending[:, :, 1:], jnp.zeros_like(pending[:, :, :1])], axis=2)
        for dy, off, wgt in taps:
            contrib = wgt * err
            if dy > 0:
                # row y's error lands on row y+dy
                contrib = jnp.concatenate(
                    [jnp.zeros_like(contrib[:, :dy]), contrib[:, :-dy]],
                    axis=1)
            new_pending = new_pending.at[:, :, off - 1].add(contrib)
        return new_pending, quant

    cols = jnp.moveaxis(sheared, 2, 0)          # (Ws, C, H)
    masks = jnp.moveaxis(valid_j, 1, 0)         # (Ws, H)
    init = jnp.zeros((C, H, max_off), dtype=img.dtype)
    _, out_cols = jax.lax.scan(step, init, (cols, masks))
    out_sheared = jnp.moveaxis(out_cols, 0, 2)  # (C, H, Ws)

    # unshear: column x of row y lives at sheared column x + y*shift
    unshear_idx = jnp.asarray(
        (np.arange(W)[None, :] + row_offsets[:, None]))  # (H, W)
    out = jnp.take_along_axis(
        out_sheared, jnp.broadcast_to(unshear_idx, (C, H, W)), axis=2)
    return jnp.clip(out, 0.0, 1.0).reshape(*lead, H, W)
