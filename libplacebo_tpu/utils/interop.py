"""Framework interop: zero-copy-where-possible ingestion from other
array frameworks.

The reference's interop layer is Vulkan external memory / DMA-BUF
handles plus AVFrame/Dav1dPicture mapping headers (SURVEY.md §5.8,
utils/libav.h).  The TPU-native equivalents:

  * dlpack  — zero-copy exchange with torch/numpy/cupy via
              `jax.dlpack` (from_torch / to_torch)
  * numpy   — host upload (the PBO path equivalent)
  * AVFrame-shaped dicts — frame_from_avframe_like maps the fields the
    libav.h header maps (format/planes/colorspace/range/chroma_location)
    without requiring ffmpeg at runtime
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.colorspace import (BitEncoding, ColorLevels, ColorPrimaries,
                               ColorRepr, ColorSpace, ColorSystem,
                               ColorTransfer)
from ..render.frame import Frame, Plane
from .upload import PlaneData, frame_from_planes

__all__ = ["from_dlpack", "to_dlpack", "from_torch", "to_torch",
           "frame_from_avframe_like", "AV_PIX_FMTS"]


def from_dlpack(capsule_or_array) -> jnp.ndarray:
    """Ingest any __dlpack__-capable array zero-copy where possible."""
    return jnp.from_dlpack(capsule_or_array)


def to_dlpack(arr: jnp.ndarray):
    """Export a jax array through the dlpack protocol."""
    return arr.__dlpack__()


def from_torch(tensor) -> jnp.ndarray:
    """torch.Tensor -> jax array (CPU tensors copy; CUDA unsupported on
    TPU hosts, so .cpu() first)."""
    if hasattr(tensor, "detach"):
        tensor = tensor.detach().contiguous()
    try:
        return jnp.from_dlpack(tensor)
    except Exception:
        return jnp.asarray(np.asarray(tensor))


def to_torch(arr: jnp.ndarray):
    import torch
    try:
        return torch.from_dlpack(arr)
    except Exception:
        return torch.from_numpy(np.asarray(arr))


# AVFrame-style pixel format descriptions: name -> (planes, subsampling,
# bit depth, component maps). Mirrors the formats utils/libav.h maps.
AV_PIX_FMTS = {
    "yuv420p": (3, (1, 1), 8, ((0,), (1,), (2,))),
    "yuv422p": (3, (1, 0), 8, ((0,), (1,), (2,))),
    "yuv444p": (3, (0, 0), 8, ((0,), (1,), (2,))),
    "yuv420p10le": (3, (1, 1), 10, ((0,), (1,), (2,))),
    "yuv420p16le": (3, (1, 1), 16, ((0,), (1,), (2,))),
    "nv12": (2, (1, 1), 8, ((0,), (1, 2))),
    "p010le": (2, (1, 1), 10, ((0,), (1, 2))),
    "gray8": (1, (0, 0), 8, ((0,),)),
    "rgb24": (1, (0, 0), 8, ((0, 1, 2),)),
    "rgba": (1, (0, 0), 8, ((0, 1, 2, 3),)),
    "gbrp": (3, (0, 0), 8, ((1,), (0,), (2,))),
}

_AVCOL_SPC = {
    "bt709": ColorSystem.BT_709, "bt470bg": ColorSystem.BT_601,
    "smpte170m": ColorSystem.BT_601, "smpte240m": ColorSystem.SMPTE_240M,
    "bt2020nc": ColorSystem.BT_2020_NC, "bt2020c": ColorSystem.BT_2020_C,
    "ictcp": ColorSystem.BT_2100_PQ, "ycgco": ColorSystem.YCGCO,
    "rgb": ColorSystem.RGB,
}
_AVCOL_PRI = {
    "bt709": ColorPrimaries.BT_709, "bt470bg": ColorPrimaries.BT_601_625,
    "smpte170m": ColorPrimaries.BT_601_525,
    "bt2020": ColorPrimaries.BT_2020, "smpte432": ColorPrimaries.DISPLAY_P3,
    "smpte431": ColorPrimaries.DCI_P3, "film": ColorPrimaries.FILM_C,
}
_AVCOL_TRC = {
    "bt709": ColorTransfer.BT_1886, "iec61966-2-1": ColorTransfer.SRGB,
    "srgb": ColorTransfer.SRGB, "linear": ColorTransfer.LINEAR,
    "smpte2084": ColorTransfer.PQ, "arib-std-b67": ColorTransfer.HLG,
    "gamma22": ColorTransfer.GAMMA22, "gamma28": ColorTransfer.GAMMA28,
}


def frame_from_avframe_like(av: dict, device=None) -> Frame:
    """Map an AVFrame-shaped dict to a Frame (the role of
    pl_frame_from_avframe, utils/libav.h). Expected keys:
      format (str), data (list of ndarrays), optionally: colorspace,
      color_primaries, color_trc, color_range ('tv'|'pc'),
      chroma_location ('left'|'center'|...).
    """
    fmt = av["format"]
    if fmt not in AV_PIX_FMTS:
        raise ValueError(f"unsupported pixel format {fmt!r}")
    n_planes, _, depth, comp_maps = AV_PIX_FMTS[fmt]
    data = av["data"]
    assert len(data) == n_planes, (len(data), n_planes)

    planes = [PlaneData(np.asarray(d), comp_maps[i], bit_depth=depth)
              for i, d in enumerate(data)]

    sys = _AVCOL_SPC.get(av.get("colorspace", ""), ColorSystem.UNKNOWN)
    if fmt.startswith(("rgb", "gbr", "bgra")) or fmt == "rgba":
        sys = ColorSystem.RGB
    levels = {"tv": ColorLevels.LIMITED, "mpeg": ColorLevels.LIMITED,
              "pc": ColorLevels.FULL, "jpeg": ColorLevels.FULL}.get(
        av.get("color_range", ""), ColorLevels.UNKNOWN)
    repr = ColorRepr(sys=sys, levels=levels,
                     bits=BitEncoding(depth, depth, 0))
    color = ColorSpace(
        primaries=_AVCOL_PRI.get(av.get("color_primaries", ""),
                                 ColorPrimaries.UNKNOWN),
        transfer=_AVCOL_TRC.get(av.get("color_trc", ""),
                                ColorTransfer.UNKNOWN))
    return frame_from_planes(
        planes, repr=repr, color=color,
        chroma_location=av.get("chroma_location", "left"), device=device)
