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
index) absorbed by the BlockSpec index maps, and an in-block part
s*y_loc <= s*127 realized as bit-decomposed rolls along the *leading*
(untiled) axis of the fetched VMEM window: a roll along dim 0 of a
(N, C, 128) array is a vreg-granular slice+concat, and the per-lane
bit masks come from a broadcasted iota over the lane (row) axis.

Fetch amplification (r3): the first version passed the input s+1
times with single-128-column-chunk blocks — every input chunk was
DMA'd s+1 times (3x HBM fetch for s=2, ~4 ms of the 6.7 ms 4K ED
frame).  Now each grid step produces G = 2s chunks of output and
fetches TWO G-chunk blocks; because G is a multiple of s, the
(G+s)-chunk source window always fits in the fetched 2G chunks
(its start offset c0 mod G is a multiple of s, hence <= G-s), cutting
fetch amplification to 2x and the per-chunk roll work from (s+1)x to
(G+s)/G = 1.5x.  The window is carved out of the concatenated blocks
with a dynamic slice along the untiled leading axis.  Block indices
that fall off the array edge are clamped; every position whose true
source is out of range is masked to zero in-kernel, so the clamped
(duplicate) loads never leak data.

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

__all__ = ["shear_to_colmaj", "unshear_from_colmaj", "shear_chunks"]

_LANE = 128


def shear_chunks(s: int) -> int:
    """Output chunks per grid step (must be a multiple of s so the
    dynamic source window never crosses the two fetched blocks)."""
    return 2 * s


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


def _shear_body(ref0, ref1, out_ref, *, s: int, G: int, W: int, H: int,
                forward: bool):
    jg = pl.program_id(0)
    h = pl.program_id(1)
    A = jnp.concatenate([ref0[...], ref1[...]], axis=0)   # (2G*128, C, 128)

    # source window start (chunk units) and its offset inside the two
    # fetched G-blocks; with G = 2s the offset delta = c0 mod G is a
    # multiple of s and <= G-s, i.e. exactly 0 or s — so the window is
    # one of two STATIC slices (Mosaic has no dynamic_slice on values;
    # a where-select between the two resident windows lowers fine)
    if forward:
        c0 = jg * G - s * h - s
    else:
        c0 = jg * G + s * h
    delta = jax.lax.rem(jax.lax.rem(c0, G) + G, G)
    win0 = A[:(G + s) * _LANE]
    win1 = A[s * _LANE:(G + 2 * s) * _LANE]
    Awin = jnp.where(delta == 0, win0, win1)

    lane = jax.lax.broadcasted_iota(jnp.int32, Awin.shape, 2)
    sh = s * lane
    B = Awin
    for b in _active_bits(s):
        amt = 1 << b
        rolled = _roll0(B, amt if forward else -amt)
        B = jnp.where(((sh >> b) & 1) == 1, rolled, B)
    if forward:
        # rolls move data upward; the first s*128 entries hold wrap
        # garbage, the output lives in the top G chunks
        out = B[s * _LANE:(G + s) * _LANE]
    else:
        out = B[:G * _LANE]

    l_ids = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
    y_loc = jax.lax.broadcasted_iota(jnp.int32, out.shape, 2)
    ygl = h * _LANE + y_loc
    if forward:
        # out[l, c, y] = img[c, y, src], src = w_global - s*y_global
        src = (jg * G - s * h) * _LANE + l_ids - s * y_loc
        valid = (src >= 0) & (src < W) & (ygl < H)
    else:
        # out[l, c, y] = colmaj[l + s*y_global, c, y]; positions past the
        # true image (w >= W or y >= H) are pad, zeroed for cleanliness
        w = jg * G * _LANE + l_ids
        valid = (w < W) & (ygl < H)
    out_ref[...] = jnp.where(valid, out, jnp.zeros_like(out))


def _call(x, W_out: int, s: int, W: int, H: int, forward: bool,
          interpret: bool):
    G = shear_chunks(s)
    GW = G * _LANE
    Win, C, Hp = x.shape
    assert Hp % _LANE == 0 and W_out % _LANE == 0
    W_pad = (W_out + GW - 1) // GW * GW
    if Win % GW:
        x = jnp.pad(x, ((0, GW - Win % GW), (0, 0), (0, 0)))
        Win = x.shape[0]
    nin = Win // GW
    body = functools.partial(_shear_body, s=s, G=G, W=W, H=H,
                             forward=forward)

    def in_map(t):
        if forward:
            # window starts at chunk jg*G - s*h - s
            return lambda jg, h, t=t: (
                jnp.clip((jg * G - s * h - s) // G + t, 0, nin - 1), 0, h)
        # window starts at chunk jg*G + s*h
        return lambda jg, h, t=t: (
            jnp.clip((jg * G + s * h) // G + t, 0, nin - 1), 0, h)

    out = pl.pallas_call(
        body,
        grid=(W_pad // GW, Hp // _LANE),
        in_specs=[pl.BlockSpec((GW, C, _LANE), in_map(t),
                               memory_space=pltpu.VMEM)
                  for t in range(2)],
        out_specs=pl.BlockSpec((GW, C, _LANE), lambda jg, h: (jg, 0, h),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W_pad, C, Hp), x.dtype),
        interpret=interpret,
    )(x, x)
    return out if W_pad == W_out else out[:W_out]


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
