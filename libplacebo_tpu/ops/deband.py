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

__all__ = ["DebandParams", "deband"]


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


def deband(img, params: Optional[DebandParams] = None, seed: int = 0,
           scale: float = 1.0):
    """Deband (..., C, H, W). `scale` is the color scale of the samples
    (reference `scale` from repr normalization; thresholds are specified
    in 8-bit-like units and divided by it)."""
    p = params or DebandParams()
    rng = np.random.default_rng(0xDEBA5D ^ seed)
    key = jax.random.PRNGKey(seed)
    h, w = img.shape[-2], img.shape[-1]

    res = img
    if p.iterations > 0:
        threshold = p.threshold / (1000.0 * scale)
        for i in range(1, p.iterations + 1):
            # K candidate offsets: dist ~ U(0, i*radius), angle ~ U(0,2pi)
            dists = rng.random(p.candidates) * i * p.radius
            angles = rng.random(p.candidates) * 2 * math.pi
            dxs = np.rint(dists * np.cos(angles)).astype(int)
            dys = np.rint(dists * np.sin(angles)).astype(int)

            key, sub = jax.random.split(key)
            choice = jax.random.randint(sub, (h, w), 0, p.candidates)

            avg = jnp.zeros_like(res)
            for k in range(p.candidates):
                dx, dy = int(dxs[k]), int(dys[k])
                a = (jnp.roll(res, (dy, dx), axis=(-2, -1)) +
                     jnp.roll(res, (dy, -dx), axis=(-2, -1)) +
                     jnp.roll(res, (-dy, dx), axis=(-2, -1)) +
                     jnp.roll(res, (-dy, -dx), axis=(-2, -1))) * 0.25
                avg = jnp.where(choice == k, a, avg)

            diff = jnp.abs(res - avg)
            bound = threshold / i
            res = jnp.where(diff > bound, res, avg)

    if p.grain > 0:
        key, sub = jax.random.split(key)
        noise = jax.random.uniform(sub, res.shape, res.dtype)
        neutral = jnp.asarray(np.asarray(p.grain_neutral, np.float32) /
                              scale).reshape(-1, 1, 1)
        strength = jnp.minimum(jnp.abs(res - neutral),
                               p.grain / (1000.0 * scale))
        res = res + strength * (noise - 0.5)

    return res
