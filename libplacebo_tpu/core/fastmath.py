"""Division-strength selection for device math.

The fused Pallas color tail (ops/pallas/color_map.py) is VPU-compute
bound; true f32 divides are multi-pass on the VPU while the hardware
reciprocal approximation (`pl.reciprocal(approx=True)`, ~2^-13 relative
error) is a single op.  The gamut/PQ math routes its divisions through
`fdiv`/`recip` below; everywhere OUTSIDE the fused kernel they are
exact true divides.  The fused kernel enters `approx_recip()` by
DEFAULT (LPTPU_APPROX_RECIP=0 opts out); the flag is read once per
process at first trace — flipping it later does not retrace (it is
deliberately NOT part of the jit cache keys).  The accuracy gate is
tools/tpu_vs_cpu.py.

Reference analog: GLSL division on GPUs is already an approximate
reciprocal multiply (mediump/fast-math), so the reference's shaders
never paid for exact divides in the first place.
"""
from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

__all__ = ["fdiv", "recip", "approx_recip", "recip_mode"]

_MODE = contextvars.ContextVar("lptpu_recip_mode", default="exact")


def recip_mode() -> str:
    return _MODE.get()


@contextlib.contextmanager
def approx_recip(enabled: bool = True):
    """Within this context, `fdiv`/`recip` trace to the TPU hardware
    reciprocal approximation.  Only valid while tracing inside a Pallas
    kernel (pl.reciprocal has no lowering elsewhere)."""
    tok = _MODE.set("approx" if enabled else "exact")
    try:
        yield
    finally:
        _MODE.reset(tok)


def recip(x):
    """1/x honoring the active mode."""
    if _MODE.get() == "approx":
        from jax.experimental import pallas as pl
        return pl.reciprocal(x, approx=True)
    return 1.0 / x


def fdiv(a, b):
    """a/b honoring the active mode (approx = a * recip(b))."""
    if _MODE.get() == "approx":
        return a * recip(b)
    return a / b
