"""Ring halo exchange for row-sharded frames.

The one communication primitive of the sharded renderer: extend a
row-partitioned (..., H_local, W) block by `halo` rows on each side.
Interior halos come from the ring neighbors over ICI (`lax.ppermute`);
what happens at the frame's first/last rows depends on `mode`, chosen
to reproduce the corresponding single-chip padding semantics exactly:

  edge    — replicate the border row (jnp.pad mode="edge"; the scaler
            plans' clamp semantics)
  reflect — mirror without repeating the edge (jnp.pad mode="reflect";
            the deinterlacers' MIRROR addressing)
  wrap    — cyclic: the top halo of shard 0 is the frame's LAST rows
            (matches jnp.roll's wrap-around; used by deband)

Reference analog: the compute-shader tile+halo cooperative loads of
sampling.c:671-790 — across chips instead of across a workgroup.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["extend_rows"]


def extend_rows(x, halo: int, n: int, axis_name: str = "spatial",
                mode: str = "edge"):
    """Extend the row-sharded (..., Hl, W) local block by `halo` rows on
    each side. Requires halo <= Hl (only ring neighbors are reached)."""
    if halo <= 0:
        return x
    if mode == "edge":
        top_edge = jnp.repeat(x[..., :1, :], halo, axis=-2)
        bot_edge = jnp.repeat(x[..., -1:, :], halo, axis=-2)
    elif mode == "reflect":
        top_edge = x[..., 1:halo + 1, :][..., ::-1, :]
        bot_edge = x[..., -halo - 1:-1, :][..., ::-1, :]
    elif mode == "wrap":
        top_edge = x[..., -halo:, :]
        bot_edge = x[..., :halo, :]
    else:
        raise ValueError(f"unknown halo mode {mode!r}")

    if n == 1:
        return jnp.concatenate([top_edge, x, bot_edge], axis=-2)

    me = jax.lax.axis_index(axis_name)
    # shard i's bottom rows sit directly above shard i+1's block
    if mode == "wrap":
        ring_dn = [(i, (i + 1) % n) for i in range(n)]
        ring_up = [(i, (i - 1) % n) for i in range(n)]
        from_above = jax.lax.ppermute(x[..., -halo:, :], axis_name, ring_dn)
        from_below = jax.lax.ppermute(x[..., :halo, :], axis_name, ring_up)
        return jnp.concatenate([from_above, x, from_below], axis=-2)

    from_above = jax.lax.ppermute(
        x[..., -halo:, :], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_below = jax.lax.ppermute(
        x[..., :halo, :], axis_name, [(i, i - 1) for i in range(1, n)])
    from_above = jnp.where(me == 0, top_edge, from_above)
    from_below = jnp.where(me == n - 1, bot_edge, from_below)
    return jnp.concatenate([from_above, x, from_below], axis=-2)
