"""Compatibility wrapper: the round-1 simplified sharded step, now a
thin shim over the full sharded renderer.

`sharded_render_step` predates `parallel.renderer.build_sharded_pipeline`
(the full Renderer under shard_map with exact single-chip parity) and
used to be a separate 180-line pipeline — a drift risk flagged in the
round-2 review. It survives only as the demo-friendly entry point with
the original signature: full-range RGB batch in, rendered batch out,
same (data, spatial) sharding, no Frame/Target plumbing required.

Semantics: HDR10 (PQ, 1000-nit) decode -> resample to (dst_h, dst_w)
with `upscaler` -> BT.2390 tone map to SDR (when tone_map) -> sRGB
encode -> blue-noise dither to `bit_depth` (0 = off). All the real
communication (ppermute halos, psum'd peak reduction) happens inside
build_sharded_pipeline.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.sharding import Mesh

__all__ = ["sharded_render_step"]


def sharded_render_step(mesh: Mesh, src_h: int, src_w: int,
                        dst_h: int, dst_w: int,
                        upscaler: str = "lanczos",
                        tone_map: bool = True,
                        bit_depth: int = 8):
    """Build a jitted multi-chip render step for (B, 3, src_h, src_w)
    full-range RGB batches (B over 'data', rows over 'spatial');
    returns run(rgb_batch) -> (B, 3, dst_h, dst_w), same sharding."""
    from ..core.colorspace import (CSP_BT2100_PQ, CSP_SRGB, ColorRepr,
                                   HdrMetadata)
    from ..ops.peak_detect import peak_detect_state_init
    from ..render.renderer import RenderParams, Target
    from .renderer import build_sharded_pipeline

    src_color = CSP_BT2100_PQ if tone_map else CSP_SRGB
    if tone_map and src_color.hdr.max_luma <= 0:
        from dataclasses import replace
        src_color = replace(src_color,
                            hdr=replace(src_color.hdr, max_luma=1000.0))
    repr_ = ColorRepr(sys="rgb", levels="full")
    target = Target(w=dst_w, h=dst_h, repr=repr_, color=CSP_SRGB,
                    bit_depth=bit_depth)
    params = RenderParams(upscaler=upscaler, downscaler=upscaler,
                          plane_upscaler=None, peak_detect=None,
                          dither=None if bit_depth == 0
                          else RenderParams().dither)
    metas = (((3, src_h, src_w), (0, 1, 2), 0.0, 0.0),)
    step = build_sharded_pipeline(mesh, metas, repr_, src_color, target,
                                  params)
    init = jnp.asarray(peak_detect_state_init())

    def run(rgb_batch):
        state = jnp.broadcast_to(init[None],
                                 (rgb_batch.shape[0],) + init.shape)
        out, _ = step(state, rgb_batch)
        return out

    return run
