"""Generate lcms2-BUILT cLUT ICC profile fixtures + golden transforms.

VERDICT r4 #5: the repo's matrix/TRC ICC paths are pinned against real
lcms2-built binaries (gen_icc_golden.py), but the cLUT paths (lut16
'mft2', v4 'mAB '/'mBA ', Lab PCS) were only tested against tag blobs
the tests themselves synthesize — layout bugs shared by builder and
parser would be invisible.  The reference's cLUT path is first-class
(/root/reference/src/shaders/icc.c:624-687, evaluated through lcms2).

This tool drives liblcms2 (bundled with Pillow) via ctypes to BUILD
cLUT-based profiles with lcms2's own serializers — the independent
implementation — and records float-precision golden transforms through
cmsCreateTransform for both directions:

  clut_v2_lut16   v2.1, RGB -> XYZ PCS, A2B0/B2A0 as lut16 ('mft2')
                  with per-channel gamma in-curves (lcms samples them
                  to 16-bit tables) and an AFFINE channel-asymmetric
                  CLUT (17^3) — affine content makes lcms's tetrahedral
                  and the parser's trilinear interpolation agree
                  exactly, so the pin validates LAYOUT at tight
                  tolerance rather than interpolation flavor.
  clut_v4_mab     v4.3, RGB -> XYZ PCS, A2B0 as 'mAB ' (A curves +
                  CLUT + B curves) / B2A0 as 'mBA '.
  clut_v2_lab     v2.1, RGB -> Lab PCS 'mft2' (LEGACY 0xFF00 Lab
                  encoding).
  clut_v4_lab_mab v4.3, RGB -> Lab PCS 'mAB '/'mBA ' (v4 Lab encoding).
  clut_v2_curved  v2.1, RGB -> XYZ 'mft2' with a genuinely CURVED CLUT
                  (9^3) — pinned looser (interpolation flavors differ)
                  to prove real-world robustness.

Outputs: tests/golden/icc/clut_*.icc + tests/golden/icc_clut_golden.npz
(arrays: rgb_in, {name}_xyz forward goldens, xyz_in_{name} reverse
inputs, {name}_rev_rgb reverse goldens).  tests/test_icc_h274.py pins
core/icc.py + the ops/icc bake against both.  Rerun only to regenerate
fixtures (committed; tests never invoke lcms2).
"""
import ctypes as C
import os
import sys

import numpy as np

from gen_icc_golden import (lcms, save_profile, rgb_grid, golden_xyz,
                            TYPE_RGB_FLT, TYPE_XYZ_FLT, FLAGS_NOOPTIMIZE,
                            FLAGS_NOCACHE, OUT_DIR)

NPZ = os.path.join(os.path.dirname(OUT_DIR), "icc_clut_golden.npz")

INTENT_PERCEPTUAL = 0

# signatures
SIG_MNTR = 0x6D6E7472          # 'mntr'
SIG_RGB = 0x52474220           # 'RGB '
SIG_XYZ = 0x58595A20           # 'XYZ '
SIG_LAB = 0x4C616220           # 'Lab '
SIG_A2B0 = 0x41324230          # 'A2B0'
SIG_B2A0 = 0x42324130          # 'B2A0'
SIG_WTPT = 0x77747074          # 'wtpt'
cmsAT_END = 1

lcms.cmsBuildGamma.restype = C.c_void_p
lcms.cmsBuildGamma.argtypes = [C.c_void_p, C.c_double]
lcms.cmsPipelineAlloc.restype = C.c_void_p
lcms.cmsPipelineAlloc.argtypes = [C.c_void_p, C.c_uint32, C.c_uint32]
lcms.cmsPipelineInsertStage.restype = C.c_int
lcms.cmsPipelineInsertStage.argtypes = [C.c_void_p, C.c_int, C.c_void_p]
lcms.cmsPipelineFree.argtypes = [C.c_void_p]
lcms.cmsStageAllocToneCurves.restype = C.c_void_p
lcms.cmsStageAllocToneCurves.argtypes = [C.c_void_p, C.c_uint32,
                                         C.POINTER(C.c_void_p)]
lcms.cmsStageAllocCLut16bit.restype = C.c_void_p
lcms.cmsStageAllocCLut16bit.argtypes = [C.c_void_p, C.c_uint32, C.c_uint32,
                                        C.c_uint32, C.POINTER(C.c_uint16)]
lcms.cmsCreateProfilePlaceholder.restype = C.c_void_p
lcms.cmsCreateProfilePlaceholder.argtypes = [C.c_void_p]
lcms.cmsSetDeviceClass.argtypes = [C.c_void_p, C.c_uint32]
lcms.cmsSetColorSpace.argtypes = [C.c_void_p, C.c_uint32]
lcms.cmsSetPCS.argtypes = [C.c_void_p, C.c_uint32]
lcms.cmsSetHeaderRenderingIntent.argtypes = [C.c_void_p, C.c_uint32]
lcms.cmsWriteTag.restype = C.c_int
lcms.cmsWriteTag.argtypes = [C.c_void_p, C.c_uint32, C.c_void_p]
lcms.cmsCloseProfile.argtypes = [C.c_void_p]


class CIEXYZ(C.Structure):
    _fields_ = [("X", C.c_double), ("Y", C.c_double), ("Z", C.c_double)]


D50 = CIEXYZ(0.9642, 1.0, 0.8249)

# channel-asymmetric affine maps (asymmetry catches axis-order /
# channel-order layout bugs; affine content keeps tetrahedral ==
# trilinear so goldens pin tight)
A2B_XYZ_MAT = np.array([[0.40, 0.30, 0.20],
                        [0.20, 0.60, 0.10],
                        [0.05, 0.10, 0.70]])
A2B_XYZ_OFF = np.array([0.02, 0.01, 0.03])
B2A_XYZ_MAT = np.array([[0.50, 0.20, 0.10],
                        [0.10, 0.60, 0.20],
                        [0.20, 0.10, 0.50]])
B2A_XYZ_OFF = np.array([0.05, 0.04, 0.06])
# Lab-PCS maps: device' -> (L, a, b)
A2B_LAB_MAT = np.array([[80.0, 10.0, 5.0],
                        [60.0, -50.0, -5.0],
                        [10.0, 20.0, -65.0]])
A2B_LAB_OFF = np.array([3.0, -10.0, 25.0])
B2A_LAB_MAT = np.array([[0.55, 0.25, 0.10],
                        [0.30, 0.45, 0.15],
                        [0.20, 0.10, 0.60]])
B2A_LAB_OFF = np.array([0.05, 0.08, 0.02])

IN_GAMMAS = (1.6, 1.8, 2.0)    # per-channel: catches curve-order bugs


def _xyz_encode16(xyz):
    """ICC 16-bit XYZ PCS encoding (u1.15 fixed): enc = XYZ * 32768."""
    return np.clip(np.round(xyz * 32768.0), 0, 65535).astype(np.uint16)


def _lab_encode16(lab, legacy: bool):
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    if legacy:                 # ICC v2 Lab16: L=100 -> 0xFF00
        Le = L / 100.0 * 0xFF00
        ae = (a + 128.0) * 256.0
        be = (b + 128.0) * 256.0
    else:                      # ICC v4 Lab16: full range
        Le = L / 100.0 * 65535.0
        ae = (a + 128.0) / 255.0 * 65535.0
        be = (b + 128.0) / 255.0 * 65535.0
    out = np.stack([Le, ae, be], axis=-1)
    return np.clip(np.round(out), 0, 65535).astype(np.uint16)


def _grid(n):
    g = np.linspace(0.0, 1.0, n)
    return np.stack(np.meshgrid(g, g, g, indexing="ij"),
                    axis=-1).reshape(-1, 3)   # first channel slowest


def _curves_stage(gammas):
    tc = (C.c_void_p * 3)(*[lcms.cmsBuildGamma(None, C.c_double(g))
                            for g in gammas])
    return lcms.cmsStageAllocToneCurves(None, 3, tc)


def _pipeline(stages):
    pipe = lcms.cmsPipelineAlloc(None, 3, 3)
    for st in stages:
        assert lcms.cmsPipelineInsertStage(pipe, cmsAT_END, st), \
            "insert stage failed"
    return pipe


def _clut_stage(table_u16, n):
    flat = np.ascontiguousarray(table_u16.reshape(-1))
    st = lcms.cmsStageAllocCLut16bit(
        None, n, 3, 3, flat.ctypes.data_as(C.POINTER(C.c_uint16)))
    assert st, "CLUT stage alloc failed"
    return st


def build_profile(version, pcs_sig, a2b_table, b2a_table, n,
                  in_gammas=IN_GAMMAS):
    """Build an RGB->PCS profile whose A2B0/B2A0 are cLUT pipelines,
    serialized by lcms2 itself (mft2 for v2 versions, mAB/mBA for v4)."""
    h = lcms.cmsCreateProfilePlaceholder(None)
    lcms.cmsSetDeviceClass(h, SIG_MNTR)
    lcms.cmsSetColorSpace(h, SIG_RGB)
    lcms.cmsSetPCS(h, pcs_sig)
    lcms.cmsSetHeaderRenderingIntent(h, INTENT_PERCEPTUAL)
    lcms.cmsSetProfileVersion(h, C.c_double(version))
    assert lcms.cmsWriteTag(h, SIG_WTPT, C.byref(D50)), "wtpt write failed"

    a2b = _pipeline([_curves_stage(in_gammas), _clut_stage(a2b_table, n),
                     _curves_stage((1.0, 1.0, 1.0))])
    assert lcms.cmsWriteTag(h, SIG_A2B0, C.c_void_p(a2b)), "A2B0 failed"
    b2a = _pipeline([_curves_stage((1.0, 1.0, 1.0)),
                     _clut_stage(b2a_table, n),
                     _curves_stage((1.0, 1.0, 1.0))])
    assert lcms.cmsWriteTag(h, SIG_B2A0, C.c_void_p(b2a)), "B2A0 failed"
    data = save_profile(h)
    lcms.cmsPipelineFree(a2b)
    lcms.cmsPipelineFree(b2a)
    lcms.cmsCloseProfile(h)
    assert len(data) > 400, "profile save failed"
    return data


def make_clut_profiles():
    out = {}
    n = 17
    pts = _grid(n)

    # XYZ-PCS pair (v2 mft2 + v4 mAB): affine CLUTs
    a2b_xyz = _xyz_encode16(pts @ A2B_XYZ_MAT.T + A2B_XYZ_OFF)
    b2a_xyz = pts @ B2A_XYZ_MAT.T + B2A_XYZ_OFF   # in [0,1]: no clip creases
    b2a_xyz = np.round(b2a_xyz * 65535).astype(np.uint16)
    out["clut_v2_lut16"] = build_profile(2.1, SIG_XYZ, a2b_xyz, b2a_xyz, n)
    out["clut_v4_mab"] = build_profile(4.3, SIG_XYZ, a2b_xyz, b2a_xyz, n)

    # Lab-PCS pair: v2 legacy encoding + v4 encoding
    lab = pts @ A2B_LAB_MAT.T + A2B_LAB_OFF
    b2a_lab = pts @ B2A_LAB_MAT.T + B2A_LAB_OFF   # in [0,1]: no clip creases
    b2a_lab = np.round(b2a_lab * 65535).astype(np.uint16)
    out["clut_v2_lab"] = build_profile(
        2.1, SIG_LAB, _lab_encode16(lab, legacy=True), b2a_lab, n)
    out["clut_v4_lab_mab"] = build_profile(
        4.3, SIG_LAB, _lab_encode16(lab, legacy=False), b2a_lab, n)

    # genuinely curved CLUT (interpolation flavors differ -> loose pin)
    nc = 9
    pc = _grid(nc)
    curved = np.stack([
        0.55 * pc[..., 0] ** 1.7 + 0.25 * pc[..., 1] * pc[..., 2] + 0.02,
        0.70 * np.sqrt(np.maximum(pc[..., 1], 0)) * (1 - 0.3 * pc[..., 0]),
        0.60 * pc[..., 2] ** 2.2 + 0.15 * pc[..., 0] ** 2 + 0.01,
    ], axis=-1)
    out["clut_v2_curved"] = build_profile(
        2.1, SIG_XYZ, _xyz_encode16(curved),
        np.round(np.clip(pc, 0, 1) * 65535).astype(np.uint16), nc)
    return out


def golden_rev_rgb(profile_bytes: bytes, xyz: np.ndarray) -> np.ndarray:
    """XYZ -> device RGB through the profile's B2A0 (perceptual)."""
    hp = lcms.cmsOpenProfileFromMem(profile_bytes, len(profile_bytes))
    hxyz = lcms.cmsCreateXYZProfile()
    # RELATIVE colorimetric: lcms falls back to the B2A0 table (no
    # *1 tags exist) WITHOUT the v4 perceptual PCS black-point mapping
    # it would insert for INTENT_PERCEPTUAL (which the repo's parser,
    # like the reference's lcms usage with relative intent, never sees)
    xf = lcms.cmsCreateTransform(hxyz, TYPE_XYZ_FLT, hp, TYPE_RGB_FLT,
                                 1, FLAGS_NOOPTIMIZE | FLAGS_NOCACHE)
    assert xf, "reverse transform failed"
    src = np.ascontiguousarray(xyz, np.float32)
    dst = np.empty_like(src)
    lcms.cmsDoTransform(xf, src.ctypes.data_as(C.c_void_p),
                        dst.ctypes.data_as(C.c_void_p), len(src))
    return dst


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    rgb = rgb_grid()
    arrays = {"rgb_in": rgb}
    for name, data in make_clut_profiles().items():
        with open(os.path.join(OUT_DIR, f"{name}.icc"), "wb") as f:
            f.write(data)
        xyz = golden_xyz(data, rgb)         # perceptual picks A2B0 too
        arrays[f"{name}_xyz"] = xyz
        # reverse: drive B2A0 over a well-covered XYZ set — the forward
        # outputs (clipped to the valid PCS range: negative XYZ is
        # out-of-spec input whose clamping is implementation-defined)
        # plus a lattice over the D50-bounded XYZ cube
        lat = np.stack(np.meshgrid(*[np.linspace(0.0, 1.0, 7)] * 3,
                                   indexing="ij"), axis=-1).reshape(-1, 3)
        lat = lat * np.array([0.9642, 1.0, 0.8249])
        xyz_in = np.concatenate([np.clip(xyz, 0.0, None), lat])
        xyz_in = np.unique(np.round(xyz_in, 5), axis=0).astype(np.float32)
        arrays[f"xyz_in_{name}"] = xyz_in
        arrays[f"{name}_rev_rgb"] = golden_rev_rgb(data, xyz_in)
        print(f"{name}: {len(data)} bytes; fwd[0]={xyz[0]}, "
              f"rev[0]={arrays[f'{name}_rev_rgb'][0]}")
    np.savez_compressed(NPZ, **arrays)
    print(f"wrote {NPZ}")


if __name__ == "__main__":
    sys.exit(main())
