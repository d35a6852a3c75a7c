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
           "plane_data_from_mask", "plane_data_from_comps",
           "plane_data_align", "CHROMA_OFFSETS", "chroma_location_offset"]

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
    bytes (or an ndarray) plus its component layout.

    Two layouts are supported:
      * planar/interleaved: `data` is (H, W) or (H, W, C) with one
        array element per component sample;
      * packed words: `component_size` is set and `data` is a (H, W)
        integer array of packed pixel words — components are unpacked
        LSB-first with `component_pad` bits of padding before each
        (exactly the reference's component_size/pad/map model, e.g.
        RGB565 in uint16 or 10:10:10:2 in uint32)."""
    data: np.ndarray                     # (H, W) or (H, W, C)
    component_map: Tuple[int, ...] = (0,)
    bit_depth: int = 0                   # 0 = infer from dtype
    bit_shift: int = 0
    shift_x: float = 0.0
    shift_y: float = 0.0
    component_size: Tuple[int, ...] = ()   # packed: bits per component
    component_pad: Tuple[int, ...] = ()    # packed: bits before each


def plane_data_from_comps(sizes, shifts):
    """Compute (component_size, component_pad, component_map) from
    per-component bit sizes and shifts in semantic (RGBA) order
    (reference pl_plane_data_from_comps, upload.c:47)."""
    comps = sorted(
        ((shifts[i], sizes[i], i) for i in range(len(sizes)) if sizes[i]),
        key=lambda c: c[0])
    size, pad, cmap = [], [], []
    offset = 0
    for shift, sz, order in comps:
        if shift < offset:
            raise ValueError("overlapping component bit ranges")
        size.append(sz)
        pad.append(shift - offset)
        cmap.append(order)
        offset += sz + (shift - offset)
    return tuple(size), tuple(pad), tuple(cmap)


def plane_data_from_mask(masks):
    """Like plane_data_from_comps but from per-component bit masks
    (reference pl_plane_data_from_mask, upload.c:78). Each mask must
    be a contiguous run of set bits."""
    sizes, shifts = [], []
    for m in masks:
        m = int(m)
        size = bin(m).count("1")
        shift = (m & -m).bit_length() - 1 if m else 0
        if m and (((1 << size) - 1) << shift) != m:
            raise ValueError(f"non-contiguous component mask {m:#x}")
        sizes.append(size)
        shifts.append(shift)
    return plane_data_from_comps(sizes, shifts)


def plane_data_align(size, pad):
    """Round byte-misaligned packed components up/out to byte
    boundaries (reference pl_plane_data_align, upload.c:96: consuming
    left padding = a bit shift, consuming right padding = ignoring
    zeros). Returns (size', pad', BitEncoding) when every component
    aligns consistently, else None."""
    size, pad = list(size), list(pad)
    color_depth = sample_depth = bit_shift = None
    offset = 0
    for i in range(len(size)):
        if color_depth is None:
            color_depth = size[i]
        elif color_depth != size[i]:
            return None
        comp_start = offset + pad[i]
        left = min(comp_start - ((comp_start - 7 + 7) & ~7), pad[i])
        pad[i] -= left
        size[i] += left
        if bit_shift is None:
            bit_shift = left
        elif bit_shift != left:
            return None
        comp_end = comp_start + size[i] - left
        right = ((comp_end + 7) & ~7) - comp_end
        if i + 1 == len(size):
            size[i] += right
        else:
            right = min(right, pad[i + 1])
            size[i] += right
            pad[i + 1] -= right
        if sample_depth is None:
            sample_depth = size[i]
        elif sample_depth != size[i]:
            return None
        offset += pad[i] + size[i]
    if sample_depth is None:
        return None
    return (tuple(size), tuple(pad),
            BitEncoding(sample_depth=sample_depth, color_depth=color_depth,
                        bit_shift=bit_shift))


# ---------------------------------------------------------------------------
# Device-side normalization: raw integer texels are uploaded AS-IS (2-4x
# fewer host->device bytes than the float32 they decode to — the link,
# not HBM, is the upload bottleneck) and the UNORM normalization /
# packed-word unpacking / (H, W, C)->(C, H, W) relayout all run on
# device as tiny jitted converters, exactly like a GPU's UNORM sampler
# doing the conversion in hardware (reference pl_upload_plane uploads
# raw texels and lets the pl_fmt do the rest, upload.c:225).  The jits
# below are module-level so XLA caches one executable per
# (dtype, shape, layout).  LPTPU_DEVICE_NORM=0 restores the host-side
# numpy path (identical values — the converters use the same float32
# operations the host code did).
# ---------------------------------------------------------------------------

import os as _os
from functools import partial as _partial

_DEVICE_NORM = _os.environ.get("LPTPU_DEVICE_NORM", "1") != "0"


@_partial(jax.jit, static_argnums=(1, 2))
def _dev_norm_planar(x, bit_shift: int, depth: int):
    """(H, W, C) integer -> (C, H, W) float32 in [0, 1] on device
    (same ops as the host path: >> bit_shift, astype, * scale)."""
    if bit_shift:
        x = x >> bit_shift
    f = x.astype(jnp.float32) * (1.0 / float(2 ** depth - 1))
    return jnp.moveaxis(f, -1, 0)


@jax.jit
def _dev_layout_float(x):
    """(H, W, C) float32 -> (C, H, W) on device (the host moveaxis+copy
    was a full-frame host-memory pass)."""
    return jnp.moveaxis(x.astype(jnp.float32), -1, 0)


@_partial(jax.jit, static_argnums=(2,))
def _dev_unpack_words(x, divs, layout):
    """(H, W) packed integer words -> (C, H, W) float32: per-component
    LSB-first shift/mask/normalize on device.  layout is a static tuple
    of (bit_offset, bit_size); divs carries the (2^size - 1) divisors
    as a TRACED float32 vector — a constant divisor would let XLA
    rewrite the divide into multiply-by-reciprocal (1-ulp off the host
    path's true division; bit-exactness with LPTPU_DEVICE_NORM=0 is
    part of the contract)."""
    xu = x.astype(jnp.uint32)
    comps = []
    for i, (off, sz) in enumerate(layout):
        c = (xu >> np.uint32(off)) & np.uint32((1 << sz) - 1)
        comps.append(c.astype(jnp.float32) / divs[i])
    return jnp.stack(comps, axis=0)


def upload_plane(pd: PlaneData, device=None) -> Plane:
    """Normalize + upload one plane (reference pl_upload_plane,
    upload.c:225)."""
    arr = np.asarray(pd.data)
    if pd.component_size:
        # packed pixel words: unpack each component LSB-first with its
        # padding, normalizing by its own bit width (the pl_fmt UNORM
        # negotiation analog for packed formats like rgb565/rgb10a2)
        assert arr.ndim == 2 and np.issubdtype(arr.dtype, np.integer), \
            "packed layout needs a 2D integer word array"
        pads = pd.component_pad or (0,) * len(pd.component_size)
        layout = []
        offset = 0
        for sz, pad in zip(pd.component_size, pads):
            offset += pad
            layout.append((offset, sz))
            offset += sz
        if _DEVICE_NORM and arr.dtype.itemsize <= 4 and offset <= 32:
            raw = jax.device_put(np.ascontiguousarray(arr), device)
            divs = jnp.asarray([float((1 << sz) - 1) for _, sz in layout],
                               jnp.float32)
            data = _dev_unpack_words(raw, divs, tuple(layout))
        else:
            # >32-bit words (none of the supported formats today):
            # host-side uint64 unpack
            words = arr.astype(np.uint64)
            unpacked = [
                ((words >> np.uint64(off)) & np.uint64((1 << sz) - 1))
                .astype(np.float32) / float((1 << sz) - 1)
                for off, sz in layout]
            farr = np.stack(unpacked, axis=-1)
            data = jnp.asarray(np.moveaxis(farr, -1, 0))   # (C, H, W)
            if device is not None:
                data = jax.device_put(data, device)
        return Plane(data=data, component_mapping=tuple(pd.component_map),
                     shift_x=pd.shift_x, shift_y=pd.shift_y)
    if arr.ndim == 2:
        arr = arr[..., None]
    comps = arr.shape[-1]
    assert comps == len(pd.component_map)

    if np.issubdtype(arr.dtype, np.integer):
        sample_depth = arr.dtype.itemsize * 8
        depth = pd.bit_depth or sample_depth
        if _DEVICE_NORM and arr.dtype.itemsize <= 4:
            raw = jax.device_put(np.ascontiguousarray(arr), device)
            data = _dev_norm_planar(raw, int(pd.bit_shift), int(depth))
            return Plane(data=data,
                         component_mapping=tuple(pd.component_map),
                         shift_x=pd.shift_x, shift_y=pd.shift_y)
        if pd.bit_shift:
            arr = arr >> pd.bit_shift
        scale = 1.0 / float(2 ** depth - 1)
        farr = arr.astype(np.float32) * scale
    else:
        farr = arr.astype(np.float32)
        if _DEVICE_NORM:
            raw = jax.device_put(np.ascontiguousarray(farr), device)
            return Plane(data=_dev_layout_float(raw),
                         component_mapping=tuple(pd.component_map),
                         shift_x=pd.shift_x, shift_y=pd.shift_y)

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
