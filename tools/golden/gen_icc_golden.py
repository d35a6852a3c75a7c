"""Generate real-world ICC profile fixtures + lcms2 golden transforms.

The reference validates its ICC path through lcms2
(/root/reference/src/shaders/icc.c:523,624-687). This tool drives the
same library (the liblcms2 bundled with Pillow) via ctypes to

1. emit REAL profile binaries — lcms2's built-in sRGB (v4), the same
   downgraded to a v2.1 profile (parametric curves become 'curv'
   tables, exercising the other parser path), and Display P3 (D65 +
   P3 primaries + the IEC 61966-2.1 curve, Apple's definition);
2. record float-precision device->PCS(XYZ) golden vectors for a grid
   of RGB samples through cmsCreateTransform (relative colorimetric,
   NOOPTIMIZE|NOCACHE so lcms evaluates the true pipeline rather than
   a resampled approximation).

Outputs: tests/golden/icc/<name>.icc + tests/golden/icc_golden.npz.
tests/test_icc_h274.py pins core/icc.py against both. Rerun only to
regenerate fixtures (they are committed; tests never invoke lcms2).
"""
import ctypes as C
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
OUT_DIR = os.path.join(REPO, "tests", "golden", "icc")
NPZ = os.path.join(REPO, "tests", "golden", "icc_golden.npz")


def load_lcms():
    cands = glob.glob("/opt/venv/lib/python*/site-packages/pillow.libs/"
                      "liblcms2*.so*") + \
        glob.glob("/usr/lib/*/liblcms2.so*")
    if not cands:
        raise SystemExit("liblcms2 not found")
    return C.CDLL(cands[0])


lcms = load_lcms()


class CIExyY(C.Structure):
    _fields_ = [("x", C.c_double), ("y", C.c_double), ("Y", C.c_double)]


class CIExyYTRIPLE(C.Structure):
    _fields_ = [("Red", CIExyY), ("Green", CIExyY), ("Blue", CIExyY)]


lcms.cmsCreate_sRGBProfile.restype = C.c_void_p
lcms.cmsCreateRGBProfile.restype = C.c_void_p
lcms.cmsCreateRGBProfile.argtypes = [C.POINTER(CIExyY),
                                     C.POINTER(CIExyYTRIPLE),
                                     C.POINTER(C.c_void_p)]
lcms.cmsCreateXYZProfile.restype = C.c_void_p
lcms.cmsBuildParametricToneCurve.restype = C.c_void_p
lcms.cmsBuildParametricToneCurve.argtypes = [C.c_void_p, C.c_int,
                                             C.POINTER(C.c_double)]
lcms.cmsSetProfileVersion.argtypes = [C.c_void_p, C.c_double]
lcms.cmsSaveProfileToMem.argtypes = [C.c_void_p, C.c_void_p,
                                     C.POINTER(C.c_uint32)]
lcms.cmsOpenProfileFromMem.restype = C.c_void_p
lcms.cmsOpenProfileFromMem.argtypes = [C.c_void_p, C.c_uint32]
lcms.cmsCreateTransform.restype = C.c_void_p
lcms.cmsCreateTransform.argtypes = [C.c_void_p, C.c_uint32, C.c_void_p,
                                    C.c_uint32, C.c_uint32, C.c_uint32]
lcms.cmsDoTransform.argtypes = [C.c_void_p, C.c_void_p, C.c_void_p,
                                C.c_uint32]

# lcms2.h pixel-type macros
PT_RGB, PT_XYZ = 4, 9
def FLOAT_SH(a): return a << 22
def COLORSPACE_SH(e): return e << 16
def CHANNELS_SH(c): return c << 3
def BYTES_SH(b): return b & 7
TYPE_RGB_FLT = FLOAT_SH(1) | COLORSPACE_SH(PT_RGB) | CHANNELS_SH(3) | \
    BYTES_SH(4)
TYPE_XYZ_FLT = FLOAT_SH(1) | COLORSPACE_SH(PT_XYZ) | CHANNELS_SH(3) | \
    BYTES_SH(4)
INTENT_RELATIVE_COLORIMETRIC = 1
FLAGS_NOOPTIMIZE = 0x0100
FLAGS_NOCACHE = 0x0040


def save_profile(h) -> bytes:
    size = C.c_uint32(0)
    lcms.cmsSaveProfileToMem(h, None, C.byref(size))
    buf = C.create_string_buffer(size.value)
    lcms.cmsSaveProfileToMem(h, buf, C.byref(size))
    return buf.raw[:size.value]


def srgb_curve():
    # IEC 61966-2.1: lcms parametric type 4 (g, a, b, c, d)
    p = (C.c_double * 5)(2.4, 1 / 1.055, 0.055 / 1.055, 1 / 12.92,
                         0.04045)
    return lcms.cmsBuildParametricToneCurve(None, 4, p)


def make_profiles():
    profiles = {}
    profiles["srgb_v4"] = save_profile(lcms.cmsCreate_sRGBProfile())

    h2 = lcms.cmsCreate_sRGBProfile()
    lcms.cmsSetProfileVersion(h2, C.c_double(2.1))
    profiles["srgb_v2"] = save_profile(h2)

    d65 = CIExyY(0.3127, 0.3290, 1.0)
    p3 = CIExyYTRIPLE(CIExyY(0.680, 0.320, 1.0),
                      CIExyY(0.265, 0.690, 1.0),
                      CIExyY(0.150, 0.060, 1.0))
    curves = (C.c_void_p * 3)(srgb_curve(), srgb_curve(), srgb_curve())
    hp3 = lcms.cmsCreateRGBProfile(C.byref(d65), C.byref(p3), curves)
    profiles["display_p3"] = save_profile(hp3)
    return profiles


def rgb_grid():
    """Sample grid: 9^3 lattice + channel ramps + known anchors."""
    g = np.linspace(0.0, 1.0, 9)
    lattice = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                       axis=-1).reshape(-1, 3)
    ramps = []
    t = np.linspace(0.0, 1.0, 33)
    for c in range(3):
        r = np.zeros((33, 3))
        r[:, c] = t
        ramps.append(r)
    anchors = np.array([[1, 1, 1], [0, 0, 0], [0.5, 0.5, 0.5],
                        [0.04045, 0.04045, 0.04045]])
    return np.concatenate([lattice] + ramps + [anchors]).astype(
        np.float32)


def golden_xyz(profile_bytes: bytes, rgb: np.ndarray) -> np.ndarray:
    hp = lcms.cmsOpenProfileFromMem(profile_bytes, len(profile_bytes))
    hxyz = lcms.cmsCreateXYZProfile()
    xf = lcms.cmsCreateTransform(hp, TYPE_RGB_FLT, hxyz, TYPE_XYZ_FLT,
                                 INTENT_RELATIVE_COLORIMETRIC,
                                 FLAGS_NOOPTIMIZE | FLAGS_NOCACHE)
    assert xf, "transform failed"
    src = np.ascontiguousarray(rgb, np.float32)
    dst = np.empty_like(src)
    lcms.cmsDoTransform(xf, src.ctypes.data_as(C.c_void_p),
                        dst.ctypes.data_as(C.c_void_p), len(src))
    return dst


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    rgb = rgb_grid()
    arrays = {"rgb_in": rgb}
    for name, data in make_profiles().items():
        with open(os.path.join(OUT_DIR, f"{name}.icc"), "wb") as f:
            f.write(data)
        xyz = golden_xyz(data, rgb)
        arrays[f"{name}_xyz"] = xyz
        print(f"{name}: {len(data)} bytes; white XYZ ="
              f" {xyz[np.all(rgb == 1.0, axis=1)][0]}")
    np.savez_compressed(NPZ, **arrays)
    print(f"wrote {NPZ}")


if __name__ == "__main__":
    sys.exit(main())
