"""Pallas shear/unshear kernels for error-diffusion dithering.

The wavefront ED kernel (ops/pallas/error_diffusion.py) consumes a
*sheared* column-major image: colmaj[w, c, y] = img[c, y, w - s*y]
(every anti-diagonal dependency becomes a strictly-earlier sheared
column).  Building that layout with XLA bit-decomposed rolls costs 13
full HBM passes over the ~2.1x-width sheared array in each direction
(~160 ms of the 193 ms 4K frame); these kernels do the same
log2-decomposed per-row roll *inside VMEM* so each direction is ONE
HBM read + ONE HBM write.

How the per-row shift maps onto TPU blocks: with 128-row lane chunks,
the shift s*y splits into a block-aligned part s*h*128 (h = row-chunk
index) absorbed by the BlockSpec index map — each output block reads
s+1 adjacent 128-column input chunks at a base offset of (+-)s*h
blocks — and an in-block part s*y_loc <= s*127 realized as
bit-decomposed rolls along the *leading* (untiled) axis of the
concatenated (s+1)*128-column VMEM window: a roll along dim 0 of a
(N, C, 128) array is a vreg-granular slice+concat, and the per-lane
bit masks come from a broadcasted iota over the lane (row) axis.
Block indices that fall off the array edge are clamped; every position
whose true source is out of range is masked to zero in-kernel, so the
clamped (duplicate) loads never leak data.

Reference analog: the shear IS the wavefront transform of
src/shaders/dithering.c:326-507 (which instead serializes through a
shmem ring buffer); no counterpart exists there because GLSL can
index arbitrarily.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["shear_to_colmaj", "unshear_from_colmaj"]

_LANE = 128


def _roll0(arr, amt: int):
    """jnp.roll(arr, amt, axis=0) for static amt (slice+concat along the
    untiled leading axis — vreg-granular, Mosaic-friendly)."""
    n = arr.shape[0]
    amt %= n
    if amt == 0:
        return arr
    return jnp.concatenate([arr[n - amt:], arr[:n - amt]], axis=0)


def _active_bits(s: int):
    """Bits that appear in {s*y : y in [0, 128)}."""
    seen = 0
    for y in range(_LANE):
        seen |= s * y
    return [b for b in range(seen.bit_length()) if (seen >> b) & 1]


def _shear_body(*refs, s: int, W: int, H: int, forward: bool):
    nc = s + 1
    chunks, out_ref = refs[:nc], refs[nc]
    j = pl.program_id(0)
    h = pl.program_id(1)
    A = jnp.concatenate([c[...] for c in chunks], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, A.shape, 2)
    sh = s * lane
    B = A
    for b in _active_bits(s):
        amt = 1 << b
        rolled = _roll0(B, amt if forward else -amt)
        B = jnp.where(((sh >> b) & 1) == 1, rolled, B)
    if forward:
        out = B[s * _LANE:(s + 1) * _LANE]
    else:
        out = B[:_LANE]

    l_ids = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    y_loc = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
    ygl = h * _LANE + y_loc
    if forward:
        # out[l, c, y] = img[c, y, src], src = w_global - s*y_global
        src = (j - s * h) * _LANE + l_ids - s * y_loc
        valid = (src >= 0) & (src < W) & (ygl < H)
    else:
        # out[l, c, y] = colmaj[l + s*y_global, c, y]; positions past the
        # true image (w >= W or y >= H) are pad, zeroed for cleanliness
        w = j * _LANE + l_ids
        valid = (w < W) & (ygl < H)
    out_ref[...] = jnp.where(valid, out, 0.0)


def _call(x, W_out: int, s: int, W: int, H: int, forward: bool,
          interpret: bool):
    Win, C, Hp = x.shape
    assert Win % _LANE == 0 and Hp % _LANE == 0 and W_out % _LANE == 0
    nin = Win // _LANE
    body = functools.partial(_shear_body, s=s, W=W, H=H, forward=forward)

    def in_map(t):
        if forward:
            # A covers src columns [(j - s*h - s)*128, (j - s*h + 1)*128)
            return lambda j, h, t=t: (jnp.clip(j - s * h - s + t, 0,
                                               nin - 1), 0, h)
        # A covers sheared columns [(j + s*h)*128, (j + s*h + s + 1)*128)
        return lambda j, h, t=t: (jnp.clip(j + s * h + t, 0, nin - 1),
                                  0, h)

    return pl.pallas_call(
        body,
        grid=(W_out // _LANE, Hp // _LANE),
        in_specs=[pl.BlockSpec((_LANE, C, _LANE), in_map(t),
                               memory_space=pltpu.VMEM)
                  for t in range(s + 1)],
        out_specs=pl.BlockSpec((_LANE, C, _LANE), lambda j, h: (j, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W_out, C, Hp), jnp.float32),
        interpret=interpret,
    )(*([x] * (s + 1)))


def shear_to_colmaj(xcm, Wsp: int, s: int, W: int, H: int,
                    interpret: bool = False):
    """(Wp, C, Hp) column-major image -> (Wsp, C, Hp) sheared column-major:
    out[w, c, y] = xcm[w - s*y, c, y] (0 where out of range)."""
    return _call(xcm, Wsp, s, W, H, forward=True, interpret=interpret)


def unshear_from_colmaj(colmaj, Wp: int, s: int, W: int, H: int,
                        interpret: bool = False):
    """(Wsp, C, Hp) sheared column-major -> (Wp, C, Hp) column-major:
    out[w, c, y] = colmaj[w + s*y, c, y] (0 in the pad region)."""
    return _call(colmaj, Wp, s, W, H, forward=False, interpret=interpret)
