"""Plane upload helpers.

TPU-native rebuild of src/utils/upload.c: `pl_plane_data` descriptions
(component bit layouts) are normalized into float planes and placed on
device.  GPU texture-format negotiation (upload.c:163) becomes dtype
normalization: integer data of any depth lands as float32 in [0,1],
exactly like GPU UNORM sampling — including bit-shifted layouts (e.g.
the xyz12 16-bit-padded case from the reference docs).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.colorspace import (BitEncoding, ColorLevels, ColorRepr,
                               ColorSpace, ColorSystem)
from ..render.frame import Frame, Plane

__all__ = ["PlaneData", "upload_plane", "frame_from_planes",
           "CHROMA_OFFSETS", "chroma_location_offset"]

# reference pl_chroma_location_offset (colorspace.c:978): shift of the
# chroma sample position relative to centered, in REF-pixel units
CHROMA_OFFSETS = {
    "left": (-0.5, 0.0),
    "center": (0.0, 0.0),
    "top_left": (-0.5, -0.5),
    "top_center": (0.0, -0.5),
    "bottom_left": (-0.5, 0.5),
    "bottom_center": (0.0, 0.5),
}


def chroma_location_offset(loc: str) -> Tuple[float, float]:
    return CHROMA_OFFSETS.get(loc, CHROMA_OFFSETS["left"])


@dataclass
class PlaneData:
    """Reference pl_plane_data (utils/upload.h): describes raw plane
    bytes (or an ndarray) plus its component layout."""
    data: np.ndarray                     # (H, W) or (H, W, C)
    component_map: Tuple[int, ...] = (0,)
    bit_depth: int = 0                   # 0 = infer from dtype
    bit_shift: int = 0
    shift_x: float = 0.0
    shift_y: float = 0.0


def upload_plane(pd: PlaneData, device=None) -> Plane:
    """Normalize + upload one plane (reference pl_upload_plane,
    upload.c:225)."""
    arr = np.asarray(pd.data)
    if arr.ndim == 2:
        arr = arr[..., None]
    comps = arr.shape[-1]
    assert comps == len(pd.component_map)

    if np.issubdtype(arr.dtype, np.integer):
        sample_depth = arr.dtype.itemsize * 8
        depth = pd.bit_depth or sample_depth
        if pd.bit_shift:
            arr = arr >> pd.bit_shift
        scale = 1.0 / float(2 ** depth - 1)
        farr = arr.astype(np.float32) * scale
    else:
        farr = arr.astype(np.float32)

    data = jnp.asarray(np.moveaxis(farr, -1, 0))   # (C, H, W)
    if device is not None:
        data = jax.device_put(data, device)
    return Plane(data=data, component_mapping=tuple(pd.component_map),
                 shift_x=pd.shift_x, shift_y=pd.shift_y)


def frame_from_planes(planes: Sequence[PlaneData],
                      repr: Optional[ColorRepr] = None,
                      color: Optional[ColorSpace] = None,
                      chroma_location: str = "left",
                      device=None) -> Frame:
    """Build a Frame from raw plane descriptions; subsampled planes get
    the chroma-location shift applied automatically."""
    ref_w = max(np.asarray(p.data).shape[1] for p in planes)
    ref_h = max(np.asarray(p.data).shape[0] for p in planes)
    cx, cy = chroma_location_offset(chroma_location)
    out = []
    for p in planes:
        h, w = np.asarray(p.data).shape[:2]
        if (w < ref_w or h < ref_h) and not (p.shift_x or p.shift_y):
            p = PlaneData(p.data, p.component_map, p.bit_depth,
                          p.bit_shift,
                          shift_x=cx if w < ref_w else 0.0,
                          shift_y=cy if h < ref_h else 0.0)
        out.append(upload_plane(p, device))
    return Frame(planes=out, repr=repr or ColorRepr(),
                 color=color or ColorSpace())
