"""Error-diffusion dither as a Pallas TPU kernel.

The reference runs error diffusion as a single compute pass that
serializes the whole image through a shared-memory ring buffer,
parallelized along anti-diagonals (src/shaders/dithering.c:326-507).

TPU translation: the image is *sheared* (on device, via log2
bit-decomposed rolls) so the anti-diagonal wavefront becomes
column-aligned (x' = x + y*shift makes every kernel dependency point at
strictly earlier sheared columns).  The Pallas kernel walks sheared
columns with a sequential grid — one column per step, straight-line
body — against a persistent (MAXOFF, C, H) pending-error VMEM scratch
(TPU grids execute sequentially, so the scratch carries across steps,
exactly the role of the reference's shmem ring buffer).  The BlockSpec
pipeline double-buffers the per-column DMAs.

END-TO-END cost at 4K (FS kernel, chained on-device harness like
bench.py, axon tunnel): ~193 ms/frame — the earlier "34 ms" note was a
kernel-centric figure that excluded the shear/unshear + column-major
relayout XLA passes, which dominate (13 bit-roll passes over the
~200 MB sheared array in each direction plus two big transposes).
Within the kernel, rolling the error once per dy and scaling the shared
rolled value per tap (instead of one lane-roll per tap) measured
207.7 -> 192.8 ms end-to-end, bit-exact.  The lax.scan formulation took
1.2 s/frame.  Compile lessons baked in: 32 columns per grid step as a
straight-line unrolled chain (single-column steps pay ~11 us each of
grid/DMA overhead and a ~5 min Mosaic compile; an in-kernel fori_loop
compiled 10x slower and ran 2x slower; K=64 regresses Mosaic compile
~4x AND runtime — 264 ms end-to-end MEASURED vs 193 at K=32; K=128
exceeds the 16 MB VMEM scoped limit outright) — the persistent XLA
disk cache (core.cache.set_xla_cache_dir)
makes the cold compile one-time per shape; the validity mask is
computed from iota on device (embedding a 100 MB mask constant cost
minutes of XLA time).

The shear/unshear + relayout now run as dedicated Pallas kernels
(ops/pallas/shear.py): one HBM read + one HBM write per direction with
the per-row rolls bit-decomposed inside VMEM, replacing the 13 HBM-pass
XLA bit-rolls + transposes that dominated the 193 ms end-to-end figure.
LPTPU_PALLAS_SHEAR=0 restores the XLA bit-roll path.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import dither as dth
from ...core.dither import ErrorDiffusionKernel

__all__ = ["error_diffusion_pallas"]

_CHUNK = 64       # sheared-width padding granularity
_LANE = 128


def _kernel_body(x_ref, out_ref, pending, *, taps, max_off,
                 scale, cols, shift, W, H, code_dt):
    """One grid step = `cols` sheared columns, processed as a
    straight-line unrolled chain (the BlockSpec pipeline double-buffers
    the multi-column DMAs; a chunked fori_loop variant compiled 10x
    slower and ran ~2x slower, and single-column steps were dominated
    by ~11 us of per-step grid/DMA overhead — batching 64 columns per
    step cut the 4K frame from 93 ms to ~25 ms and Mosaic compile from
    ~5 min to ~1 min).

    x_ref/out_ref: (cols, C, Hp) — column-major sheared layout
    pending:       (max_off, C, Hp) VMEM scratch, slot s = error landing
                   s+1 columns ahead of the *current* column (persists
                   across the sequential grid like the reference's shmem
                   ring buffer)

    Validity of each (column, row) — sheared column j holds image row y
    at j = x + y*shift, so y is valid iff j-y*shift in [0, W) and
    y < H — is computed in-register from iota (r3: passing it as a
    (Wsp, 1, Hp) f32 operand cost a 71 MB HBM read per 4K frame).

    MEASURED DEAD END (late r3, don't redo): re-viewing the (C, Hp)
    per-column data as (C*Hp/128, 128) to pack tile sublanes full
    (flat rolls = lane roll + sublane carry + the existing row mask)
    REGRESSED 6.9 -> 8.9 ms at 4K — the wavefront is not limited by
    sublane occupancy, and the extra carry ops per dy are pure loss.
    """
    @pl.when(pl.program_id(0) == 0)
    def _init():
        pending[...] = jnp.zeros_like(pending)

    C, Hp = x_ref.shape[1], x_ref.shape[2]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (C, Hp), 1)
    j0 = pl.program_id(0) * cols
    # keep the rolling window in registers within the step; touch the
    # VMEM scratch only at the step boundary
    window = [pending[s] for s in range(max_off)]
    for k in range(cols):
        cur = x_ref[k] + window[0]                     # (C, Hp)
        # the quantized value IS an integer code: store the code
        # (int16/int32) instead of the f32 value — the unshear pass and
        # its write then move 2-4x fewer bytes; the final convert
        # (code * 1/scale, fused with the clip + relayout in XLA)
        # reproduces today's f32 arithmetic bit-exactly
        rounded = jnp.round(cur * scale)
        quant = rounded * (1.0 / scale)
        j = j0 + k
        off = row_ids * shift
        valid = (j >= off) & (j < off + W) & (row_ids < H)
        err = jnp.where(valid, cur - quant, 0.0)
        # clamp before the int cast: f32->int conversion of out-of-range
        # values is undefined in XLA (could wrap), while the old f32
        # path saturated overshoot via the final jnp.clip.  quant/err
        # stay unclamped so in-range arithmetic is bit-identical.
        out_ref[k] = jnp.clip(rounded, 0.0, scale).astype(code_dt)

        # contributions per destination slot (error landing off columns
        # ahead lands in slot off-1 after the implicit shift).  The
        # lane-axis roll is the expensive per-tap op, and every tap at
        # the same dy needs the same rolled error — roll once per dy and
        # scale the shared rolled value per tap (bit-exact: each
        # destination still receives the one product wgt*err[src]).
        nxt_window = window[1:] + [jnp.zeros((C, Hp), jnp.float32)]
        rolled = {0: err}
        for dy in sorted({d for d, _, _ in taps if d > 0}):
            # image row y's error lands on row y+dy: shift along the
            # lane (row) axis with zero fill
            r = pltpu.roll(err, dy, 1)
            rolled[dy] = jnp.where(row_ids < dy, 0.0, r)
        for dy, off, wgt in taps:
            nxt_window[off - 1] = nxt_window[off - 1] + wgt * rolled[dy]
        window = nxt_window
    for s in range(max_off):
        pending[s] = window[s]


def error_diffusion_pallas(img, new_depth: int,
                           kernel: Optional[ErrorDiffusionKernel] = None,
                           interpret: bool = False, cols_per_step: int = 32):
    """Error-diffusion dither of (..., C, H, W) to `new_depth` bits."""
    k = kernel or dth.ED_FLOYD_STEINBERG
    kern = np.asarray(k.pattern, dtype=np.float32) / k.divisor
    shift = k.shift
    *lead, H, W = img.shape
    x = img.reshape((-1, H, W))
    C = x.shape[0]
    scale = float((1 << new_depth) - 1)
    K = max(1, int(cols_per_step))

    taps = []
    for dy in range(3):
        for dx in range(-2, 3):
            wgt = float(kern[dy, dx + 2])
            if wgt != 0.0:
                taps.append((dy, dx + dy * shift, wgt))
    max_off = max(off for _, off, _ in taps)

    # shear: sheared[c, y, x + y*shift] = img[c, y, x].  A direct
    # take_along_axis gather costs ~700 ms at 4K on TPU; the per-row
    # shift y*shift instead decomposes into log2 bit-rolls.  Default
    # path: Pallas kernels do the rolls inside VMEM (one HBM pass per
    # direction, ops/pallas/shear.py); LPTPU_PALLAS_SHEAR=0 falls back
    # to XLA whole-array bit-rolls (13 HBM passes each way at 4K).
    use_kshear = os.environ.get("LPTPU_PALLAS_SHEAR", "1") != "0"
    Ws = W + (H - 1) * shift
    if use_kshear:
        from .shear import shear_chunks
        gw = shear_chunks(shift) * _LANE
        base = _LANE * K // np.gcd(_LANE, K)    # lcm: kernel + ED grid
        chunk = base * gw // np.gcd(base, gw)   # ... + shear G-blocks
    else:
        chunk = max(_CHUNK, K)
    Wsp = (Ws + chunk - 1) // chunk * chunk
    Hp = (H + _LANE - 1) // _LANE * _LANE
    row_offsets = np.arange(H) * shift

    def _bit_shear(arr, shifts, width, inverse=False):
        """Roll each row y of (..., H, width) by shifts[y] (or back)."""
        max_s = int(shifts.max())
        nbits = max(1, max_s.bit_length())
        out = arr
        for b in range(nbits):
            amt = 1 << b
            mask = ((shifts >> b) & 1).astype(bool)
            rolled = jnp.roll(out, -amt if inverse else amt, axis=-1)
            mask_j = jnp.asarray(mask)[..., :, None]
            out = jnp.where(mask_j, rolled, out)
        return out

    if use_kshear:
        from .shear import shear_to_colmaj
        Wp = (W + gw - 1) // gw * gw
        xcm = jnp.pad(jnp.moveaxis(x, 2, 0),
                      ((0, Wp - W), (0, 0), (0, Hp - H)))
        colmaj = shear_to_colmaj(xcm, Wsp, shift, W, H,
                                 interpret=interpret)
    else:
        # validity mask computed on device from iota — embedding the
        # (H, Ws) mask as a program constant ballooned compile times
        col = jax.lax.broadcasted_iota(jnp.int32, (H, Ws), 1)
        off = jax.lax.broadcasted_iota(jnp.int32, (H, Ws), 0) * shift
        valid_j = ((col >= off) & (col < off + W)).astype(jnp.float32)
        xpad = jnp.pad(x, ((0, 0), (0, 0), (0, Ws - W)))
        sheared = _bit_shear(xpad, row_offsets, Ws)
        sheared = sheared * valid_j

        # layout: (Ws, C, Hp) column-major for lane-friendly math
        colmaj = jnp.moveaxis(sheared, 2, 0)                    # (Ws, C, H)
        colmaj = jnp.pad(colmaj, ((0, Wsp - Ws), (0, 0), (0, Hp - H)))

    # quantization codes ride int16 (int32 for >15-bit depths) through
    # the wavefront write + the whole unshear leg — 2-4x less HBM
    # traffic on the 2.13x-wide sheared array, bit-exact (the code is
    # integral and |code| << 32768; the final code * (1/scale) + clip
    # is the same f32 arithmetic as before).  LPTPU_ED_INT_CODES=0
    # opts back into f32 (process-start-only, like other LPTPU_ flags).
    if os.environ.get("LPTPU_ED_INT_CODES", "1") != "0":
        code_dt = jnp.int16 if scale < 32000.0 else jnp.int32
    else:
        code_dt = jnp.float32
    body = functools.partial(_kernel_body, taps=tuple(taps),
                             max_off=max_off, scale=scale, cols=K,
                             shift=shift, W=W, H=H, code_dt=code_dt)
    out_cm = pl.pallas_call(
        body,
        grid=(Wsp // K,),
        in_specs=[
            pl.BlockSpec((K, C, Hp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, C, Hp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Wsp, C, Hp), code_dt),
        scratch_shapes=[pltpu.VMEM((max_off, C, Hp), jnp.float32)],
        interpret=interpret,
    )(colmaj)

    if use_kshear:
        from .shear import unshear_from_colmaj
        xcm_out = unshear_from_colmaj(out_cm, Wp, shift, W, H,
                                      interpret=interpret)
        codes = jnp.moveaxis(xcm_out, 0, 2)[:, :H, :W]          # (C, H, W)
    else:
        # unshear with the inverse bit-rolls
        out_sheared = jnp.moveaxis(out_cm[:Ws, :, :H], 0, 2)    # (C, H, Ws)
        codes = _bit_shear(out_sheared, row_offsets, Ws,
                           inverse=True)[..., :W]
    out = codes.astype(jnp.float32) * (1.0 / scale)
    return jnp.clip(out, 0.0, 1.0).reshape(*lead, H, W)
