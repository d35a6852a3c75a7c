"""Dither matrix generation: Bayer, blue noise (void-and-cluster), and the
error-diffusion kernel table.

TPU-native rebuild of the reference's dither math (src/dither.c,
src/include/libplacebo/dither.h).  Matrices are generated host-side
(vectorized numpy rather than the reference's pointwise C loops) and
uploaded once as small device LUTs; the per-pixel application is in
ops.dithering.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass
from functools import lru_cache
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = [
    "DitherMethod", "bayer_matrix", "blue_noise", "white_noise",
    "ErrorDiffusionKernel", "ERROR_DIFFUSION_KERNELS",
    "find_error_diffusion_kernel",
]


class DitherMethod(enum.Enum):
    """Reference pl_dither_method (dithering.h)."""
    BLUE_NOISE = "blue"
    ORDERED_LUT = "ordered_lut"   # bayer via LUT
    ORDERED_FIXED = "ordered"     # bayer computed inline (16x16)
    WHITE_NOISE = "white"


@lru_cache(maxsize=16)
def bayer_matrix(size: int) -> np.ndarray:
    """Normalized `size`x`size` Bayer matrix, values in [0,1)
    (reference pl_generate_bayer_matrix, dither.c:36 — starts at 0 with
    NO half-step centering; golden-verified). `size` must be a power of
    two. Built by the standard recursive 2x2 expansion."""
    assert size >= 1 and (size & (size - 1)) == 0, "size must be power of 2"
    m = np.zeros((1, 1), dtype=np.int64)
    n = 1
    while n < size:
        m = np.block([[4 * m + 0, 4 * m + 2],
                      [4 * m + 3, 4 * m + 1]])
        n *= 2
    return (m.astype(np.float64) / (size * size)).astype(np.float32)


def white_noise(size: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.random((size, size), dtype=np.float32)


@lru_cache(maxsize=8)
def blue_noise(shift: int) -> np.ndarray:
    """(2^shift)x(2^shift) blue-noise matrix in [0,1) via the
    void-and-cluster method (reference pl_generate_blue_noise,
    dither.c:175, after Ulichney).

    The native incremental-energy implementation (native/dither.cc,
    ~1000x this Python fallback, which re-runs an FFT per insertion)
    handles large matrices (shift 8 = 256x256 in ~2 s vs minutes); both
    produce a full rank ordering with the same spectral structure,
    though not bit-identical orderings (different deterministic seeds).
    """
    from ..native import blue_noise_native
    nat = blue_noise_native(shift)
    if nat is not None:
        return nat
    size = 1 << shift
    n = size * size
    sigma = 1.5
    # toroidal gaussian kernel in frequency domain
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    dy = np.minimum(yy, size - yy)
    dx = np.minimum(xx, size - xx)
    g = np.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    G = np.fft.rfft2(g)

    def energy(b):
        return np.fft.irfft2(np.fft.rfft2(b) * G, s=(size, size))

    rng = np.random.default_rng(0xC0FFEE)
    # Phase 0: random initial pattern with n/10 ones, relaxed into blue noise
    ones = max(1, n // 10)
    binary = np.zeros((size, size))
    idx = rng.choice(n, ones, replace=False)
    binary.flat[idx] = 1.0

    # swap tightest cluster / largest void until stable
    for _ in range(n):
        e = energy(binary)
        cluster = np.unravel_index(np.argmax(np.where(binary > 0, e, -np.inf)),
                                   binary.shape)
        binary[cluster] = 0.0
        e = energy(binary)
        void = np.unravel_index(np.argmin(np.where(binary > 0, np.inf, e)),
                                binary.shape)
        if void == cluster:
            binary[cluster] = 1.0
            break
        binary[void] = 1.0

    rank = np.zeros((size, size), dtype=np.int64)
    # Phase 1: rank the initial ones by removing tightest clusters
    pattern = binary.copy()
    for r in range(ones - 1, -1, -1):
        e = energy(pattern)
        cluster = np.unravel_index(np.argmax(np.where(pattern > 0, e, -np.inf)),
                                   pattern.shape)
        pattern[cluster] = 0.0
        rank[cluster] = r
    # Phase 2: fill voids with increasing rank
    pattern = binary.copy()
    for r in range(ones, n):
        e = energy(pattern)
        void = np.unravel_index(np.argmin(np.where(pattern > 0, np.inf, e)),
                                pattern.shape)
        pattern[void] = 1.0
        rank[void] = r

    return ((rank.astype(np.float64) + 0.5) / n).astype(np.float32)


# ---------------------------------------------------------------------------
# Error-diffusion kernels (reference dither.c:192-305). The 5x3 pattern is
# centered on column index 2; `shift` is the horizontal block shift used by
# the wavefront parallelization.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ErrorDiffusionKernel:
    name: str
    description: str
    shift: int
    pattern: Tuple[Tuple[int, ...], ...]   # 3 rows x 5 cols, centered at [0][2]
    divisor: int

    def normalized(self) -> np.ndarray:
        return np.asarray(self.pattern, dtype=np.float32) / self.divisor


ED_SIMPLE = ErrorDiffusionKernel(
    "simple", "Simple error diffusion", 1,
    ((0, 0, 0, 1, 0), (0, 0, 1, 0, 0), (0, 0, 0, 0, 0)), 2)
ED_FALSE_FS = ErrorDiffusionKernel(
    "false-fs", "False Floyd-Steinberg kernel", 1,
    ((0, 0, 0, 3, 0), (0, 0, 3, 2, 0), (0, 0, 0, 0, 0)), 8)
ED_SIERRA_LITE = ErrorDiffusionKernel(
    "sierra-lite", "Sierra Lite kernel", 2,
    ((0, 0, 0, 2, 0), (0, 1, 1, 0, 0), (0, 0, 0, 0, 0)), 4)
ED_FLOYD_STEINBERG = ErrorDiffusionKernel(
    "floyd-steinberg", "Floyd Steinberg kernel", 2,
    ((0, 0, 0, 7, 0), (0, 3, 5, 1, 0), (0, 0, 0, 0, 0)), 16)
ED_ATKINSON = ErrorDiffusionKernel(
    "atkinson", "Atkinson kernel", 2,
    ((0, 0, 0, 1, 1), (0, 1, 1, 1, 0), (0, 0, 1, 0, 0)), 8)
ED_JARVIS_JUDICE_NINKE = ErrorDiffusionKernel(
    "jarvis-judice-ninke", "Jarvis, Judice & Ninke kernel", 3,
    ((0, 0, 0, 7, 5), (3, 5, 7, 5, 3), (1, 3, 5, 3, 1)), 48)
ED_STUCKI = ErrorDiffusionKernel(
    "stucki", "Stucki kernel", 3,
    ((0, 0, 0, 8, 4), (2, 4, 8, 4, 2), (1, 2, 4, 2, 1)), 42)
ED_BURKES = ErrorDiffusionKernel(
    "burkes", "Burkes kernel", 3,
    ((0, 0, 0, 8, 4), (2, 4, 8, 4, 2), (0, 0, 0, 0, 0)), 32)
ED_SIERRA2 = ErrorDiffusionKernel(
    "sierra-2", "Two-row Sierra", 3,
    ((0, 0, 0, 4, 3), (1, 2, 3, 2, 1), (0, 0, 0, 0, 0)), 16)
ED_SIERRA3 = ErrorDiffusionKernel(
    "sierra-3", "Three-row Sierra", 3,
    ((0, 0, 0, 5, 3), (2, 4, 5, 4, 2), (0, 2, 3, 2, 0)), 32)

ERROR_DIFFUSION_KERNELS = [
    ED_SIMPLE, ED_FALSE_FS, ED_SIERRA_LITE, ED_FLOYD_STEINBERG, ED_ATKINSON,
    ED_JARVIS_JUDICE_NINKE, ED_STUCKI, ED_BURKES, ED_SIERRA2, ED_SIERRA3,
]

_ED_BY_NAME: Dict[str, ErrorDiffusionKernel] = {
    k.name: k for k in ERROR_DIFFUSION_KERNELS}


def find_error_diffusion_kernel(name: str) -> Optional[ErrorDiffusionKernel]:
    return _ED_BY_NAME.get(name)
