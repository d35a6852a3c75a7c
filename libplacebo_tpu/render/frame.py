"""Frame & plane representation.

TPU-native equivalent of the reference's pl_frame/pl_plane
(src/include/libplacebo/renderer.h:342-520): a frame is a set of planar
float32 device arrays plus colorimetry metadata.  Unlike the reference
(GPU textures with sampler state), planes are jnp arrays of shape
(components, H, W); the metadata fields are static Python values that key
the jit cache.
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.colorspace import (BitEncoding, ColorLevels, ColorPrimaries,
                               ColorRepr, ColorSpace, ColorSystem,
                               ColorTransfer)
from ..core.common import Rect, RectF, Rotation

__all__ = ["Plane", "Frame", "Overlay", "OverlayPart",
           "frame_from_yuv420p", "frame_from_rgb"]


@dataclass
class Plane:
    """One image plane (reference pl_plane, renderer.h:342).

    data: (components, H, W) float32 jnp array, values already normalized
    to [0,1] over the sample depth (the uploader does the bit-depth
    normalization, like GPU texture sampling in the reference).
    component_mapping: for each component, which canonical channel it
    carries (0=R/Y, 1=G/Cb, 2=B/Cr, 3=A).
    """
    data: jnp.ndarray
    component_mapping: Tuple[int, ...] = (0,)
    # subtexel shift of this plane relative to the reference plane, in
    # units of *this plane's* texels (reference pl_plane.shift_x/y)
    shift_x: float = 0.0
    shift_y: float = 0.0

    @property
    def components(self) -> int:
        return len(self.component_mapping)

    @property
    def h(self) -> int:
        return self.data.shape[-2]

    @property
    def w(self) -> int:
        return self.data.shape[-1]


@dataclass(frozen=True)
class OverlayPart:
    """One overlay quad (reference pl_overlay_part, renderer.h:258):
    `src` addresses the overlay texture in texels, `dst` is expressed in
    the overlay's `coords` space.  `color` tints monochrome overlays
    (multiplied into the sampled first channel)."""
    src: RectF
    dst: RectF
    color: Tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0)


@dataclass
class Overlay:
    """Overlay (subtitles/OSD); reference pl_overlay (renderer.h:254-340).

    `data` is (4, H, W) RGBA for mode="normal" (premultiplied per
    `repr.alpha`), or a (1, H, W) alpha map for mode="monochrome" (each
    part's `color` supplies the actual color, like libass bitmaps).

    `coords` picks the space `parts[*].dst` is expressed in (reference
    pl_overlay_coords): "auto" (= src_frame for image overlays,
    dst_frame for target overlays), "src_frame", "src_crop",
    "dst_frame", "dst_crop".  Legacy shorthand: with no `parts`, the
    whole texture is drawn at `rect` in *target* coordinates.

    `repr`/`color` describe the overlay's own encoding; when they
    differ from the target's, the renderer converts (decode -> linear
    -> primaries matrix -> clip = the reference's linear-tone-map +
    saturation OSD path, renderer.c:962-983)."""
    data: jnp.ndarray
    rect: Optional[RectF] = None
    color: ColorSpace = field(default_factory=ColorSpace)
    repr: ColorRepr = field(default_factory=ColorRepr)
    mode: str = "normal"                 # "normal" | "monochrome"
    coords: str = "auto"
    parts: Tuple[OverlayPart, ...] = ()

    _MODES = ("normal", "monochrome")
    _COORDS = ("auto", "src_frame", "src_crop", "dst_frame", "dst_crop")

    def get_parts(self) -> Tuple[OverlayPart, ...]:
        """The parts to draw; the legacy whole-texture `rect` shorthand
        becomes a single part."""
        if self.mode not in self._MODES:
            raise ValueError(f"unknown overlay mode {self.mode!r}; "
                             f"one of {self._MODES}")
        if self.coords not in self._COORDS:
            raise ValueError(f"unknown overlay coords {self.coords!r}; "
                             f"one of {self._COORDS}")
        if self.parts:
            return tuple(self.parts)
        h, w = self.data.shape[-2], self.data.shape[-1]
        dst = self.rect or RectF(0.0, 0.0, float(w), float(h))
        return (OverlayPart(RectF(0.0, 0.0, float(w), float(h)), dst),)

    def key(self) -> tuple:
        """Static signature for the jit cache (geometry, mode, coords,
        and encoding metadata all bake into the trace)."""
        return (tuple(self.data.shape), self.mode, self.coords,
                self.repr.sys, self.repr.levels, self.repr.alpha,
                self.color.primaries, self.color.transfer, self.color.hdr,
                self.rect if not self.parts else None,
                tuple((p.src, p.dst, p.color) for p in self.parts))


@dataclass
class Frame:
    """Reference pl_frame (renderer.h:491-520)."""
    planes: List[Plane]
    repr: ColorRepr = field(default_factory=ColorRepr)
    color: ColorSpace = field(default_factory=ColorSpace)
    crop: Optional[RectF] = None
    rotation: Rotation = Rotation(0)
    # aspect ratio of a raw (encoded, pre-rotation) pixel; 0 = square /
    # unknown.  Renderer-neutral metadata: applications stretch their
    # target crop by it (reference pl_frame.pixel_aspect_ratio,
    # renderer.h:623; demos/plplay.c:405)
    pixel_aspect_ratio: float = 0.0
    # lazy mapping hooks (reference pl_frame.acquire/release,
    # renderer.h:565-569): `acquire(frame)` runs before the renderer
    # touches the planes (fill/map them here; return False to abort the
    # render), `release(frame)` runs after — including after failures.
    # Interlaced prev/next frames are acquired alongside.
    acquire: Optional[object] = None     # Callable[[Frame], bool]
    release: Optional[object] = None     # Callable[[Frame], None]
    overlays: List[Overlay] = field(default_factory=list)
    # film grain metadata (reference pl_frame.film_grain); seed may change
    # per frame without recompilation
    film_grain: Optional[object] = None   # core.film_grain.FilmGrainData
    # interlacing (reference pl_frame.field + pl_frame_mix temporal refs)
    field: Optional[object] = None        # ops.deinterlace.Field
    first_field: Optional[object] = None
    prev: Optional["Frame"] = None        # previous/next fields' frames
    next: Optional["Frame"] = None
    # source ICC profile (reference pl_frame.profile); consumed by the
    # renderer's decode side when set (core.icc.IccProfile)
    icc: Optional[object] = None
    # profiling / mixing identity
    pts: float = 0.0
    signature: int = 0

    @property
    def ref_plane(self) -> Plane:
        """The plane carrying luma/alpha-free channel 0 (reference
        fix_refs_and_rects picks the largest plane containing Y/R)."""
        best = self.planes[0]
        for p in self.planes:
            if 0 in p.component_mapping:
                if (p.w * p.h) >= (best.w * best.h) or \
                        0 not in best.component_mapping:
                    best = p
        return best

    @property
    def w(self) -> int:
        return self.ref_plane.w

    @property
    def h(self) -> int:
        return self.ref_plane.h

    def get_crop(self) -> RectF:
        return self.crop or RectF(0, 0, self.w, self.h)

    def is_cropped(self) -> bool:
        """True when the (rounded, normalized) crop covers less than the
        full reference plane (reference pl_frame_is_cropped,
        renderer.c:4098)."""
        c = self.get_crop()
        x0 = round(min(c.x0, c.x1))
        y0 = round(min(c.y0, c.y1))
        x1 = round(max(c.x0, c.x1))
        y1 = round(max(c.y0, c.y1))
        if not x0 and not x1:
            x1 = self.w
        if not y0 and not y1:
            y1 = self.h
        return x0 > 0 or y0 > 0 or x1 < self.w or y1 < self.h

    def set_chroma_location(self, loc: str) -> None:
        """Apply a chroma siting shift to every subsampled plane
        (reference pl_frame_set_chroma_location, renderer.c:4048).
        `loc` names a siting per utils.upload.CHROMA_OFFSETS
        ("left", "center", "top_left", ...)."""
        from ..utils.upload import chroma_location_offset
        sx, sy = chroma_location_offset(loc)
        ref_w, ref_h = self.w, self.h
        for p in self.planes:
            if p.w < ref_w or p.h < ref_h:
                p.shift_x, p.shift_y = sx, sy

    def meta_key(self) -> tuple:
        """Static signature of everything that affects the compiled
        pipeline (the jit-cache key contribution). Grain *structure*
        (which channels, lag, overlap...) is static; the seed is not —
        per-frame seeds only swap the traced grain tables."""
        grain_static = None
        if self.film_grain is not None and self.film_grain.av1 is not None:
            a = self.film_grain.av1
            grain_static = (self.film_grain.type,
                            a.num_points_y > 0,
                            a.num_points_uv[0] > 0, a.num_points_uv[1] > 0,
                            a.chroma_scaling_from_luma, a.overlap,
                            a.scaling_shift)
        elif self.film_grain is not None and \
                self.film_grain.h274 is not None:
            # h274 params (incl. seed) are currently trace-baked
            grain_static = ("h274", hash(repr(self.film_grain)))
        # DV RPU coefficients enter the pipeline as traced arrays
        # (ops.dovi.pack_dovi) — the key only needs presence
        dovi_key = self.repr.dovi is not None
        icc_key = None
        if self.icc is not None:
            icc_key = getattr(self.icc, "signature", 0) or id(self.icc)
        return (
            tuple((p.data.shape, p.component_mapping, p.shift_x, p.shift_y)
                  for p in self.planes),
            self.repr.sys, self.repr.levels, self.repr.alpha,
            self.repr.bits, dovi_key,
            self.color.primaries, self.color.transfer,
            # full HDR metadata: min/max_luma & scene stats bake into the
            # traced tone-map/gamut math (renderer: hdr_rescale of the
            # inferred levels), so they must key the pipeline cache
            self.color.hdr,
            self.get_crop(), self.rotation, grain_static, icc_key,
            self.field, self.first_field,
            self.prev is not None, self.next is not None,
            tuple(o.key() for o in self.overlays),
        )


# ---------------------------------------------------------------------------
# Convenience constructors (the moral equivalent of utils/upload.c helpers)
# ---------------------------------------------------------------------------

@jax.jit
def _dev_norm_gray(x, div):
    """Integer plane -> float32 in [0, 1] on device.  The divisor is a
    TRACED scalar: a constant would let XLA substitute
    multiply-by-reciprocal, 1 ulp off the host path's true division."""
    return x.astype(jnp.float32) / div


def frame_from_yuv420p(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                       repr: Optional[ColorRepr] = None,
                       color: Optional[ColorSpace] = None,
                       bit_depth: int = 8) -> Frame:
    """Build a Frame from planar YUV 4:2:0 integer or float data.
    Integer data is normalized by 2^depth-1 (like GPU UNORM sampling) —
    ON DEVICE: the raw integers upload as-is (2-4x fewer link bytes
    than float32) and a cached jitted divide normalizes them, the
    UNORM-sampler analog (see utils/upload.py device-side
    normalization)."""
    from ..utils import upload as _upload

    def norm(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.integer):
            # LPTPU_DEVICE_NORM=0 opts out of the device-side path here
            # too (same flag as utils/upload.py — the advertised revert
            # must cover BOTH ingestion entry points, ADVICE r4)
            if _upload._DEVICE_NORM and x.dtype.itemsize <= 4:
                return _dev_norm_gray(
                    jnp.asarray(np.ascontiguousarray(x)),
                    jnp.float32(2 ** bit_depth - 1))
            x = x.astype(np.float32) / float(2 ** bit_depth - 1)
        return jnp.asarray(x.astype(np.float32))

    h, w = y.shape
    repr = repr or ColorRepr(
        sys=ColorSystem.BT_709 if w >= 1280 else ColorSystem.BT_601,
        levels=ColorLevels.LIMITED,
        bits=BitEncoding(bit_depth, bit_depth, 0))
    color = color or ColorSpace()
    # MPEG-2 ("left") chroma siting: chroma centers align with even luma
    # columns = -0.5 ref-pixel shift (pl_chroma_location_offset(LEFT))
    planes = [
        Plane(norm(y)[None], (0,)),
        Plane(norm(u)[None], (1,), shift_x=-0.5),
        Plane(norm(v)[None], (2,), shift_x=-0.5),
    ]
    return Frame(planes=planes, repr=repr, color=color)


def frame_from_rgb(rgb: np.ndarray, color: Optional[ColorSpace] = None,
                   levels: ColorLevels = ColorLevels.FULL) -> Frame:
    """Frame from an interleaved (H, W, 3) or planar (3, H, W) RGB array."""
    rgb = np.asarray(rgb, dtype=np.float32)
    if rgb.ndim == 3 and rgb.shape[-1] in (3, 4):
        rgb = np.moveaxis(rgb, -1, 0)
    planes = [Plane(jnp.asarray(rgb), tuple(range(rgb.shape[0])))]
    return Frame(planes=planes,
                 repr=ColorRepr(sys=ColorSystem.RGB, levels=levels),
                 color=color or ColorSpace())
