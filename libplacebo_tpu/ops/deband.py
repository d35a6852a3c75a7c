"""Debanding + grain injection.

TPU-native rebuild of pl_shader_deband (src/shaders/sampling.c:183-277).
The reference samples 4 rotationally-symmetric points at a per-pixel
random (angle, distance) each iteration, averages them, and keeps the
average wherever it stays within a threshold of the original — then adds
uniform grain.

Per-pixel random *gathers* are pathological on TPU, so the sampling is
restructured: each iteration draws K candidate offset vectors (host RNG),
computes the K 4-point rolled averages (contiguous shifts — pure
HBM-bandwidth ops XLA handles natively), and every pixel selects one
candidate with a per-pixel random index.  Statistically this is the same
estimator with the offset distribution quantized to K draws per
iteration; K=8 is visually indistinguishable from the reference's
continuous sampling for the smooth-gradient content debanding targets.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DebandParams", "deband", "deband_rng_tables", "deband_halo",
           "plane_grain_neutral"]


@dataclass(frozen=True)
class DebandParams:
    """Reference pl_deband_params (shaders/sampling.h:66-104); defaults
    mirror pl_deband_default_params."""
    iterations: int = 1
    threshold: float = 3.0
    radius: float = 16.0
    grain: float = 4.0
    grain_neutral: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    candidates: int = 8          # TPU-specific: offset draws per iteration

    def key(self):
        return (self.iterations, self.threshold, self.radius, self.grain,
                self.grain_neutral, self.candidates)


def plane_grain_neutral(repr, mapping) -> Tuple[float, ...]:
    """Per-plane-channel grain neutral values (reference
    renderer.c:1716-1761): limited-range luma rests at 16/256, chroma
    at 0.5 (both rescaled by the sample-depth out_scale); non-YCbCr
    systems use the luma neutral for every channel.  `mapping` is the
    plane's component_mapping; alpha channels get 0 (the renderer never
    debands alpha planes)."""
    from ..core.colorspace import (ColorLevels, levels_guess,
                                   system_is_ycbcr_like)
    bits = repr.bits.sample_depth
    out_scale = (1 << bits) / ((1 << bits) - 1.0) if bits else 1.0
    neutral_luma = 0.0
    neutral_chroma = 0.5 * out_scale
    if levels_guess(repr) == ColorLevels.LIMITED:
        neutral_luma = 16 / 256.0 * out_scale
    if not system_is_ycbcr_like(repr.sys):
        neutral_chroma = neutral_luma
    return tuple(0.0 if c == 3 else
                 (neutral_luma if c == 0 else neutral_chroma)
                 for c in mapping)


def _offset_draws(p: DebandParams, seed: int):
    """Host-side candidate offset vectors per iteration (numpy RNG,
    deterministic by seed): [(dxs, dys), ...]."""
    rng = np.random.default_rng(0xDEBA5D ^ seed)
    draws = []
    for i in range(1, p.iterations + 1):
        dists = rng.random(p.candidates) * i * p.radius
        angles = rng.random(p.candidates) * 2 * math.pi
        dxs = np.rint(dists * np.cos(angles)).astype(int)
        dys = np.rint(dists * np.sin(angles)).astype(int)
        draws.append((dxs, dys))
    return draws


def deband_halo(p: DebandParams, seed: int) -> int:
    """Max |row offset| any iteration samples — the halo a row-sharded
    execution must exchange per iteration."""
    h = 0
    for dxs, dys in _offset_draws(p, seed):
        h = max(h, int(np.max(np.abs(dys))) if len(dys) else 0)
    return h


def deband_rng_tables(p: DebandParams, shape, seed: int,
                      dtype=jnp.float32):
    """The per-frame random tables deband() draws internally, generated
    for the FULL frame shape (..., C, H, W): per-iteration candidate
    choices [(H, W) int32, ...] and grain noise (shape, f32).  A
    row-sharded execution slices these along H and passes them via
    `tables` so every pixel sees the same draw as the single-chip path."""
    h, w = shape[-2], shape[-1]
    key = jax.random.PRNGKey(seed)
    choices = []
    for _ in range(p.iterations):
        key, sub = jax.random.split(key)
        choices.append(jax.random.randint(sub, (h, w), 0, p.candidates))
    noise = None
    if p.grain > 0:
        key, sub = jax.random.split(key)
        noise = jax.random.uniform(sub, tuple(shape), dtype)
    return choices, noise


def _cyclic_rows(res, ext, halo: int, dy: int):
    """Rows of roll(res, dy, axis=-2) from the cyclically halo-extended
    block `ext` (|dy| <= halo)."""
    if halo == 0 or dy == 0:
        return res
    hl = res.shape[-2]
    return ext[..., halo - dy: halo - dy + hl, :]


def deband(img, params: Optional[DebandParams] = None, seed: int = 0,
           scale: float = 1.0, tables=None, shard=None, neutral=None):
    """Deband (..., C, H, W). `scale` is the color scale of the samples
    (reference `scale` from repr normalization; thresholds are specified
    in 8-bit-like units and divided by it).

    tables: optional (choices, noise) from deband_rng_tables (sliced to
    this block's rows); default draws them internally.
    shard: optional (axis_name, n_shards) — the rows of `img` are one
    shard of a row-partitioned frame inside shard_map; global rolls are
    reproduced with cyclic ring halo exchange (wrap-around matches
    jnp.roll exactly), so the sharded output equals the single-chip one.
    """
    p = params or DebandParams()
    h, w = img.shape[-2], img.shape[-1]
    if tables is None:
        choices, noise = deband_rng_tables(p, img.shape, seed, img.dtype)
    else:
        choices, noise = tables

    if shard is not None:
        from ..parallel.halo import extend_rows as _extend
        axis_name, n_sh = shard

    res = img
    if p.iterations > 0:
        threshold = p.threshold / (1000.0 * scale)
        for it, (dxs, dys) in enumerate(_offset_draws(p, seed)):
            choice = choices[it]
            if shard is not None:
                halo = int(np.max(np.abs(dys))) if len(dys) else 0
                ext = _extend(res, halo, n_sh, axis_name, mode="wrap") \
                    if halo else res

            avg = jnp.zeros_like(res)
            for k in range(p.candidates):
                dx, dy = int(dxs[k]), int(dys[k])
                # sum the two row-rolled taps FIRST, then lane-roll the
                # sum both ways: row (sublane) rolls are ~free on TPU
                # and this halves the lane rolls — 2.20 -> 1.08 ms for
                # 2 iterations at 1080p (MEASURED r3; the naive four
                # 2D rolls cost 4x).  The sharded branch uses the same
                # association so shard parity stays bit-exact.
                if shard is None:
                    s = (jnp.roll(res, dy, axis=-2) +
                         jnp.roll(res, -dy, axis=-2))
                else:
                    s = (_cyclic_rows(res, ext, halo, dy) +
                         _cyclic_rows(res, ext, halo, -dy))
                a = (jnp.roll(s, dx, axis=-1) +
                     jnp.roll(s, -dx, axis=-1)) * 0.25
                avg = jnp.where(choice == k, a, avg)

            diff = jnp.abs(res - avg)
            bound = threshold / (it + 1)
            res = jnp.where(diff > bound, res, avg)

    if p.grain > 0:
        # `neutral` (per channel of THIS plane, from plane_grain_neutral)
        # overrides the 3-wide params value; either way the vector is
        # cut/padded to the actual channel count so 1/2-component planes
        # (NV12-style chroma) never hit a broadcast mismatch
        c = res.shape[-3]
        ntr = np.asarray(p.grain_neutral if neutral is None else neutral,
                         np.float32).ravel()
        ntr = np.pad(ntr[:c], (0, max(0, c - ntr[:c].size)))
        ntr = jnp.asarray(ntr / scale).reshape(-1, 1, 1)
        strength = jnp.minimum(jnp.abs(res - ntr),
                               p.grain / (1000.0 * scale))
        res = res + strength * (noise - 0.5)

    return res
