"""Spatially-sharded render pipeline: rows of each frame distributed over
the 'spatial' mesh axis, frames over 'data'.

This is the ICI-native replacement for the reference's multi-GPU frame
hand-off (demos/multigpu-bench.c): instead of copying whole frames
between devices through host memory, one frame's rows live sharded
across chips; separable resampling exchanges only the filter-footprint
halo rows with ring neighbors (`lax.ppermute`), and the HDR peak
reduction is a `psum`/`pmax` over the mesh.

The W-axis pass and all pointwise color math need no communication.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map  # JAX >= 0.7 canonical location
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import filters as flt
from ..core import tone_mapping as tm
from ..core.colorspace import (COLOR_SDR_WHITE, BitEncoding, ColorLevels,
                               ColorRepr, ColorSpace, ColorSystem,
                               HdrScaling, hdr_rescale)
from ..core.transfer import pq_eotf_fast as pq_eotf, \
    pq_oetf_fast as pq_oetf
from ..ops import color as ops_color
from ..ops import dithering as ops_dither
from ..ops import sampling as ops_sampling

__all__ = ["sharded_render_step", "sharded_resample_rows"]


def _plan_row_shards(cfg, src_h, dst_h, n_shards):
    """Per-shard gather plan: for shard i producing output rows
    [i*dst_l, (i+1)*dst_l), indices into its (halo + local + halo)
    extended row block. Returns (idx_all (n, dst_l, T), w_all, halo)."""
    assert src_h % n_shards == 0 and dst_h % n_shards == 0
    src_l, dst_l = src_h // n_shards, dst_h // n_shards
    idx, w = ops_sampling.ortho_weights(cfg, src_h, dst_h)   # global plan
    taps = idx.shape[1]
    halo = taps  # generous: max reach beyond local block
    idx_all = np.zeros((n_shards, dst_l, taps), np.int32)
    for i in range(n_shards):
        gidx = idx[i * dst_l:(i + 1) * dst_l].astype(np.int64)
        # local extended block covers global rows [i*src_l - halo,
        # (i+1)*src_l + halo); clamp is already inside global idx
        lidx = gidx - (i * src_l - halo)
        if lidx.min() < 0 or lidx.max() >= src_l + 2 * halo:
            raise ValueError("halo too small for filter footprint")
        idx_all[i] = lidx
    w_all = w.reshape(n_shards, dst_l, taps)
    return idx_all, w_all, halo


def sharded_resample_rows(x, idx_all, w_all, halo, axis_name="spatial"):
    """Inside shard_map: resample the (sharded) row axis of (..., Hl, W)
    using ring halo exchange. idx_all/w_all are per-shard plans."""
    n = jax.lax.psum(1, axis_name)
    me = jax.lax.axis_index(axis_name)

    # exchange halo rows with ring neighbors
    top_rows = x[..., :halo, :]       # my top rows -> prev's bottom halo
    bot_rows = x[..., -halo:, :]      # my bottom rows -> next's top halo
    # neighbor above sends me its bottom rows (they sit just above my block)
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])
    ext = jnp.concatenate([from_above, x, from_below], axis=-2)

    idx = idx_all[me]                 # (dst_l, T) traced gather
    w = w_all[me]
    taps = idx.shape[-1]
    out = None
    for t in range(taps):
        rows = jnp.take(ext, idx[:, t], axis=-2)
        term = rows * w[:, t][..., :, None]
        out = term if out is None else out + term
    return out


def sharded_render_step(mesh: Mesh, src_h: int, src_w: int,
                        dst_h: int, dst_w: int,
                        upscaler: str = "lanczos",
                        tone_map: bool = True,
                        bit_depth: int = 8):
    """Build the jitted multi-chip render step.

    Input:  (B, 3, src_h, src_w) full-range RGB batch, B sharded over
            'data', rows over 'spatial'.
    Output: (B, 3, dst_h, dst_w) with the same sharding.

    Pipeline: linearize (PQ) -> per-frame peak detection [pmax over the
    'spatial' axis] -> row-resample [ppermute halo] -> col-resample
    [local matmul] -> tone map to SDR -> delinearize -> dither.
    """
    n_sp = mesh.shape["spatial"]
    cfg = flt.find_filter_config(upscaler)
    assert cfg is not None and not cfg.polar
    idx_all, w_all, halo = _plan_row_shards(cfg, src_h, dst_h, n_sp)
    idx_j, w_j = jnp.asarray(idx_all), jnp.asarray(w_all)

    # tone map params for the static HDR10->SDR case (applied closed-form
    # on device via tm.apply_device; LUT gathers are slow on TPU)
    p = tm.ToneMapParams(
        function=tm.TONE_MAP_BT2390,
        input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
        lut_size=256,
        input_min=0.0,
        input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0),
        output_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.2),
        output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                               COLOR_SDR_WHITE))

    # W-axis dense matrix (local, MXU)
    idx_w, w_w = ops_sampling.ortho_weights(cfg, src_w, dst_w)
    dense_w = np.zeros((dst_w, src_w), np.float32)
    np.add.at(dense_w, (np.arange(dst_w)[:, None], idx_w), w_w)
    dense_wj = jnp.asarray(dense_w)

    # per-shard dither bias rows
    bias_full = ops_dither._bias_matrix(ops_dither.DitherParams(),
                                        dst_h, dst_w)
    bias_j = jnp.asarray(bias_full)

    def step(rgb, bias):
        # rgb: local block (B_l, 3, H_l, W)
        x = jnp.maximum(rgb, 0.0)

        if tone_map:
            # per-frame peak detection: max over this frame's local rows
            # (H, W only — frames sharing a data shard stay independent),
            # then an all-reduce over the 'spatial' axis where the rest
            # of each frame's rows live
            luma = jnp.max(x, axis=1)
            local_peak = jnp.max(luma, axis=(-2, -1))        # (B_l,)
            peak = jax.lax.pmax(local_peak, "spatial")[:, None, None, None]

        # rows (halo exchange over ICI)
        y = sharded_resample_rows(x, idx_j, w_j, halo)
        # cols (local MXU matmul)
        y = jnp.einsum("bchw,ow->bcho", y, dense_wj, precision="highest")

        if tone_map:
            maxrgb = jnp.max(y, axis=1, keepdims=True)
            # clamp to the globally detected peak (the psum'd collective
            # result feeds back into the per-pixel math, like the
            # reference's SSBO peak buffer) then LUT tone map in PQ space
            maxrgb = jnp.minimum(maxrgb, peak)
            mpq = tm.apply_device(jnp.clip(maxrgb, 0.0, 1.0), p)
            ratio = pq_eotf(mpq) / jnp.maximum(pq_eotf(maxrgb), 1e-6)
            y = y * ratio

        if bit_depth:
            scale = float((1 << bit_depth) - 1)
            y = jnp.floor(y * scale + bias[None, None]) / scale
        return jnp.clip(y, 0.0, 1.0)

    spec_in = P("data", None, "spatial", None)
    spec_bias = P("spatial", None)
    step_sharded = shard_map(
        step, mesh=mesh,
        in_specs=(spec_in, spec_bias),
        out_specs=spec_in,
        check_vma=False)

    @jax.jit
    def run(rgb_batch):
        return step_sharded(rgb_batch, bias_j)

    return run
