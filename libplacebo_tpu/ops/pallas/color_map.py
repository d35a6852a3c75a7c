"""Fused pointwise mega-pass (Pallas).

The render pipeline's tail — tone map + gamut map (one IPT round trip)
+ delinearize + encode + dither — is a long elementwise chain over the
full-resolution frame.  XLA fuses *most* of it, but the channel-mix
dots, transcendental splits and the dither table read still leave the
chain split across several HBM passes; at 4K each materialized pass is
~1 ms of pure memory bandwidth (the pipeline is bandwidth-bound, see
CLAUDE.md).  This harness runs the WHOLE chain as ONE Pallas kernel:
each (C, block_rows, W) tile is read into VMEM once, every stage
executes on-chip, and the finished tile is written once — the TPU
equivalent of the reference merging its color-map stages into a single
fragment shader (pl_shader_color_map_ex + pl_shader_dither compose into
one pass via sh_subpass, shaders.h:152).

`fused_pointwise` is generic: it takes the stage chain as a *function*
(traced inside the kernel), so the renderer composes the exact same
`color_map_stage` / `delinearize` / `encode_color` / `dither` closures
it would run under plain XLA — one code path, two lowerings, identical
math.  Channel mixes are forced to the unrolled-FMA lowering inside the
kernel (ops.color.mat_impl): Mosaic has no useful lowering for the tiny
(3, 3) einsum dots.
"""
from __future__ import annotations

import os
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
try:  # pragma: no cover - import layout differs across jax versions
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["fused_pointwise", "supported_here"]

# Process-start-only flag (like the other LPTPU_* switches): read ONCE
# at import so a later env flip can never disagree with already-traced
# kernels — the flag is deliberately NOT part of the jit cache keys.
_APPROX_RECIP = os.environ.get("LPTPU_APPROX_RECIP", "1") != "0"


def supported_here() -> bool:
    """True when the compiled (non-interpret) kernel can run."""
    return jax.default_backend() not in ("cpu",) and pltpu is not None


def _pick_block_rows(h: int, budget_rows: int = 8) -> int:
    """Largest divisor of `h` that is <= budget and a multiple of 8 when
    possible (f32 sublane tile); falls back to any divisor, then to a
    cdiv grid with a partial last block."""
    best = 0
    for bh in range(budget_rows, 0, -1):
        if h % bh == 0 and bh % 8 == 0:
            return bh
        if h % bh == 0 and best == 0:
            best = bh
    return best or budget_rows


def fused_pointwise(img, fn: Callable, scalars: Sequence = (),
                    tables: Sequence = (), out_channels: Optional[int] = None,
                    block_rows: int = 8, interpret: Optional[bool] = None,
                    extra_out: Sequence[Tuple[int, ...]] = ()):
    """Apply `fn` to `img` as one fused Pallas pass.

    img      — (C, H, W) float32.
    fn       — fn(x, scalar_values, table_blocks) -> (C_out, bh, W);
               must be pointwise along H/W (each block is processed
               independently; no cross-row communication).
    scalars  — traced scalar values, passed through SMEM.
    tables   — (H, W) arrays blocked alongside the image (dither bias).
    interpret— force interpreter mode (None = auto: interpret on CPU).
    extra_out— per-block reduction outputs: for each shape (s...) given,
               fn must return an extra (s...) array after the main
               block, collected into a (grid, s...) output (the analog
               of the reference's per-workgroup shmem partials,
               colorspace.c:1240-1290).  With extras, fused_pointwise
               returns (main, *extras).

    block_rows=8 (one f32 sublane tile) measures FASTEST at 4K on v5e:
    4.33 ms vs 5.56 (16 rows) / 6.57 (24 rows) / 6.06 for the plain XLA
    tail — small blocks keep the HBM↔VMEM pipeline dense enough to hide
    the chain's heavy VPU work behind the streaming.
    """
    C, H, W = img.shape[-3], img.shape[-2], img.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() in ("cpu",)
    bh = _pick_block_rows(H, block_rows)
    grid = (pl.cdiv(H, bh),)

    n_sc = len(scalars)
    n_tb = len(tables)
    if out_channels is None:
        out_shape = jax.eval_shape(
            lambda x: fn(x, tuple(scalars), tuple(tables)), img)
        if isinstance(out_shape, (tuple, list)):
            out_shape = out_shape[0]
        out_channels = out_shape.shape[-3]

    from .. import color as ops_color
    from ...core import fastmath

    # hardware reciprocal approximation for the chain's divisions
    # (pq fast curves, softclip rationals, 1/C hue normalization):
    # ~2^-13 relative error, single VPU op vs the multi-pass exact
    # divide.  MEASURED: 124.5 -> 129.1 fps on the 1080p->4K headline;
    # TPU-vs-CPU gate unchanged (53.2 dB hq / 68.7 dB sep, frac>1e-3
    # 0.235%) — the approx error sits below the existing f32 cross-
    # backend noise floor.  LPTPU_APPROX_RECIP=0 restores exact divides
    # (process-start-only; see _APPROX_RECIP above).
    approx = not interpret and _APPROX_RECIP

    n_ex = len(extra_out)

    def kernel(*refs):
        sc_refs = refs[:n_sc]
        img_ref = refs[n_sc]
        tb_refs = refs[n_sc + 1:n_sc + 1 + n_tb]
        out_ref = refs[n_sc + 1 + n_tb]
        ex_refs = refs[n_sc + 2 + n_tb:]
        x = img_ref[:]
        sc_vals = tuple(r[0, 0] for r in sc_refs)
        tb_vals = tuple(r[:] for r in tb_refs)
        with ops_color.mat_impl("unrolled"), \
                fastmath.approx_recip(approx):
            res = fn(x, sc_vals, tb_vals)
        if n_ex:
            out_ref[:] = res[0]
            for r, e in zip(ex_refs, res[1:]):
                r[:] = e.reshape(r.shape)
        else:
            out_ref[:] = res

    sc_spec = pl.BlockSpec(
        (1, 1), lambda i: (0, 0),
        memory_space=pltpu.SMEM if pltpu is not None else None) \
        if not interpret else pl.BlockSpec((1, 1), lambda i: (0, 0))
    img_spec = pl.BlockSpec((C, bh, W), lambda i: (0, i, 0))
    tb_spec = pl.BlockSpec((bh, W), lambda i: (i, 0))
    out_spec = pl.BlockSpec((out_channels, bh, W), lambda i: (0, i, 0))
    ex_specs = [pl.BlockSpec((1,) + tuple(s),
                             lambda i, _nd=len(s): (i,) + (0,) * _nd)
                for s in extra_out]

    call = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((out_channels, H, W), jnp.float32)]
        + [jax.ShapeDtypeStruct((grid[0],) + tuple(s), jnp.float32)
           for s in extra_out],
        grid=grid,
        in_specs=[sc_spec] * n_sc + [img_spec] + [tb_spec] * n_tb,
        out_specs=[out_spec] + ex_specs,
        interpret=interpret,
    )
    sc_args = tuple(jnp.asarray(s, jnp.float32).reshape(1, 1)
                    for s in scalars)
    tb_args = tuple(jnp.asarray(t, jnp.float32) for t in tables)
    outs = call(*sc_args, img.astype(jnp.float32), *tb_args)
    return outs[0] if not n_ex else tuple(outs)
