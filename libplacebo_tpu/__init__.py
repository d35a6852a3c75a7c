"""libplacebo_tpu — a TPU-native real-time video rendering framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of libplacebo
(https://code.videolan.org/videolan/libplacebo): high-quality scaling
(polar EWA, separable Lanczos), HDR tone mapping with live histogram peak
detection, colorimetric color management, debanding, film grain synthesis,
dithering — redesigned for TPU hardware: XLA fusion replaces GLSL shader
merging, Pallas kernels replace compute shaders, and device meshes replace
multi-GPU interop.

Layer map (mirrors the reference's tiers; see SURVEY.md §7):
  core/     — Tier 0: pure host math (colorspace, tone/gamut curves,
              filters, dither matrices, cache, options)
  ops/      — Tier 2: device image operations (sampling, color, deband,
              grain, dither, deinterlace, LUTs)
  render/   — Tiers 3+4: the renderer (= pl_render_image) with its jit
              pipeline cache (= pl_dispatch), frames, queue, hooks
  parallel/ — multi-chip mesh sharding (spatial tiles + halo exchange)
  utils/    — upload helpers, interop
  runtime   — Tier 1: device context (pl_gpu analog), limits, uploads
"""

__version__ = "0.2.0"

from . import core  # noqa: F401

# Lazy top-level conveniences (PEP 562): `libplacebo_tpu.Renderer` etc.
# without importing jax-heavy modules at package import time.
_LAZY = {
    "Renderer": ("render.renderer", "Renderer"),
    "RenderParams": ("render.renderer", "RenderParams"),
    "Target": ("render.renderer", "Target"),
    "render_image": ("render.renderer", "render_image"),
    "render_image_mix": ("render.renderer", "render_image_mix"),
    "Frame": ("render.frame", "Frame"),
    "Plane": ("render.frame", "Plane"),
    "Overlay": ("render.frame", "Overlay"),
    "FrameQueue": ("render.queue", "FrameQueue"),
    "Options": ("core.options", "Options"),
}


def __getattr__(name):
    try:
        mod_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute "
                             f"{name!r}") from None
    import importlib
    mod = importlib.import_module(f".{mod_name}", __name__)
    val = getattr(mod, attr)
    globals()[name] = val
    return val
