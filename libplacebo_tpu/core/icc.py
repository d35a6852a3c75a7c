"""ICC profile support.

TPU-native rebuild of the reference's ICC subsystem
(src/shaders/icc.c, built on lcms2): profile parsing, gamut/TRC
inference, and decode/encode transform construction.

lcms2 isn't available here, so this is a self-contained parser for the
ICC v2/v4 profiles that matter in practice for displays: matrix/TRC
profiles (rXYZ/gXYZ/bXYZ + curv/para TRCs + wtpt, with chad adaptation).
LUT-based (A2B/B2A) profiles are detected and rejected with a clear
error — the reference's renderer likewise falls back to no ICC when
pl_icc_open fails (graceful degradation).
"""
from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, Optional, Tuple

import numpy as np

from .colorspace import (CIE_D50, CIExy, RawPrimaries, adapt_white_matrix)

__all__ = ["IccProfile", "IccError", "parse_icc"]


class IccError(ValueError):
    pass


def _s15f16(v: int) -> float:
    return v / 65536.0


@dataclass
class IccCurve:
    """A TRC: either a pure gamma, a sampled table, or parametric."""
    kind: str                  # "gamma" | "table" | "para"
    gamma: float = 1.0
    table: Optional[np.ndarray] = None      # normalized [0,1]
    para: Tuple[float, ...] = ()
    para_type: int = 0

    def eval(self, x: np.ndarray) -> np.ndarray:
        """Signal -> linear, vectorized (numpy or jnp array)."""
        if self.kind == "gamma":
            return np.maximum(x, 0.0) ** self.gamma
        if self.kind == "table":
            t = np.clip(x, 0.0, 1.0) * (len(self.table) - 1)
            lo = np.floor(t).astype(np.int64)
            hi = np.minimum(lo + 1, len(self.table) - 1)
            f = t - lo
            return self.table[lo] * (1 - f) + self.table[hi] * f
        # parametric (ICC paraCurveType): types 0-4
        p = self.para
        g = p[0]
        x = np.asarray(x, dtype=np.float64)
        if self.para_type == 0:
            return np.maximum(x, 0.0) ** g
        if self.para_type == 1:
            a, b = p[1], p[2]
            return np.where(x >= -b / a, np.maximum(a * x + b, 0.0) ** g, 0.0)
        if self.para_type == 2:
            a, b, c = p[1], p[2], p[3]
            return np.where(x >= -b / a,
                            np.maximum(a * x + b, 0.0) ** g + c, c)
        if self.para_type == 3:  # sRGB-style
            a, b, c, d = p[1], p[2], p[3], p[4]
            return np.where(x >= d, np.maximum(a * x + b, 0.0) ** g, c * x)
        if self.para_type == 4:
            a, b, c, d, e, f = p[1], p[2], p[3], p[4], p[5], p[6]
            return np.where(x >= d,
                            np.maximum(a * x + b, 0.0) ** g + e, c * x + f)
        raise IccError(f"unsupported parametric curve type {self.para_type}")

    def eval_inverse(self, y: np.ndarray, samples: int = 4096) -> np.ndarray:
        """Numeric inverse via a monotone resampled table."""
        xs = np.linspace(0.0, 1.0, samples)
        ys = self.eval(xs)
        return np.interp(np.clip(y, ys[0], ys[-1]), ys, xs)


@dataclass
class IccProfile:
    """Parsed profile (subset of pl_icc_object, shaders/icc.h)."""
    color_space: str
    pcs: str
    version: int
    white: CIExy
    rgb2xyz: Optional[np.ndarray] = None       # to PCS (D50) XYZ
    trc: Tuple[IccCurve, ...] = ()
    chad: Optional[np.ndarray] = None
    description: str = ""

    def containing_primaries(self) -> RawPrimaries:
        """Infer the gamut from the matrix columns (reference
        pl_icc_open's gamut detection)."""
        if self.rgb2xyz is None:
            raise IccError("no matrix to infer primaries")
        m = self.rgb2xyz
        # undo chromatic adaptation to D50 to get display-white XYZ
        adapt = adapt_white_matrix(self.white, CIE_D50).invert().m \
            if self.white else np.eye(3)
        cols = adapt @ m
        prims = []
        for i in range(3):
            X, Y, Z = cols[:, i]
            s = X + Y + Z
            prims.append(CIExy(X / s, Y / s))
        W = cols @ np.ones(3)
        ws = W.sum()
        white = CIExy(W[0] / ws, W[1] / ws)
        return RawPrimaries(red=prims[0], green=prims[1], blue=prims[2],
                            white=white)

    def decode(self, rgb: np.ndarray) -> np.ndarray:
        """Signal RGB (...,3) -> linear display RGB (per-channel TRC)."""
        out = np.stack([self.trc[i].eval(rgb[..., i]) for i in range(3)],
                       axis=-1)
        return out

    def encode(self, rgb_linear: np.ndarray) -> np.ndarray:
        return np.stack([self.trc[i].eval_inverse(rgb_linear[..., i])
                         for i in range(3)], axis=-1)


def _parse_curve(data: bytes) -> IccCurve:
    sig = data[:4]
    if sig == b"curv":
        (count,) = struct.unpack(">I", data[8:12])
        if count == 0:
            return IccCurve("gamma", 1.0)
        if count == 1:
            (g,) = struct.unpack(">H", data[12:14])
            return IccCurve("gamma", g / 256.0)
        vals = np.frombuffer(data[12:12 + 2 * count],
                             dtype=">u2").astype(np.float64) / 65535.0
        return IccCurve("table", table=vals)
    if sig == b"para":
        (ptype,) = struct.unpack(">H", data[8:10])
        nparams = {0: 1, 1: 3, 2: 4, 3: 5, 4: 7}.get(ptype)
        if nparams is None:
            raise IccError(f"bad parametric curve type {ptype}")
        raw = struct.unpack(f">{nparams}i", data[12:12 + 4 * nparams])
        return IccCurve("para", para=tuple(_s15f16(v) for v in raw),
                        para_type=ptype)
    raise IccError(f"unsupported curve tag {sig!r}")


def _parse_xyz(data: bytes) -> np.ndarray:
    if data[:4] != b"XYZ ":
        raise IccError("bad XYZ tag")
    x, y, z = struct.unpack(">3i", data[8:20])
    return np.array([_s15f16(x), _s15f16(y), _s15f16(z)])


def parse_icc(data: bytes) -> IccProfile:
    """Parse an ICC profile (reference pl_icc_open, shaders/icc.c:523)."""
    if len(data) < 132:
        raise IccError("profile too small")
    size, = struct.unpack(">I", data[:4])
    color_space = data[16:20].decode("ascii", "replace").strip()
    pcs = data[20:24].decode("ascii", "replace").strip()
    version = data[8]

    (tag_count,) = struct.unpack(">I", data[128:132])
    if len(data) < 132 + 12 * tag_count:
        raise IccError("truncated tag table")
    tags: Dict[bytes, bytes] = {}
    for i in range(tag_count):
        off = 132 + 12 * i
        sig, toff, tsize = struct.unpack(">4sII", data[off:off + 12])
        if toff + tsize <= len(data):
            tags[sig] = data[toff:toff + tsize]

    if color_space != "RGB":
        raise IccError(f"unsupported profile color space {color_space!r}")
    if b"A2B0" in tags and b"rXYZ" not in tags:
        raise IccError("LUT-based (A2B) profiles not supported")
    for req in (b"rXYZ", b"gXYZ", b"bXYZ", b"rTRC", b"gTRC", b"bTRC"):
        if req not in tags:
            raise IccError(f"missing required tag {req!r}")

    m = np.stack([_parse_xyz(tags[b"rXYZ"]), _parse_xyz(tags[b"gXYZ"]),
                  _parse_xyz(tags[b"bXYZ"])], axis=1)
    trc = tuple(_parse_curve(tags[t])
                for t in (b"rTRC", b"gTRC", b"bTRC"))

    white = CIE_D50
    if b"wtpt" in tags:
        W = _parse_xyz(tags[b"wtpt"])
        s = W.sum()
        if s > 0:
            white = CIExy(W[0] / s, W[1] / s)

    chad = None
    if b"chad" in tags and tags[b"chad"][:4] == b"sf32":
        vals = struct.unpack(">9i", tags[b"chad"][8:44])
        chad = np.array([_s15f16(v) for v in vals]).reshape(3, 3)
        # derive the actual display white by undoing the adaptation
        W = np.linalg.inv(chad) @ np.array(
            [CIE_D50.to_XYZ()[0], 1.0, CIE_D50.to_XYZ()[2]])
        s = W.sum()
        white = CIExy(W[0] / s, W[1] / s)

    desc = ""
    for dtag in (b"desc", b"dscm"):
        if dtag in tags and tags[dtag][:4] == b"desc":
            (dlen,) = struct.unpack(">I", tags[dtag][8:12])
            desc = tags[dtag][12:12 + dlen].decode("ascii", "replace")\
                .rstrip("\x00")
            break

    return IccProfile(color_space=color_space, pcs=pcs, version=version,
                      white=white, rgb2xyz=m, trc=trc, chad=chad,
                      description=desc)
