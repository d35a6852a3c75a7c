"""Core colorspace invariants — oracle: reference src/tests/colorspace.c."""
import numpy as np
import pytest

from libplacebo_tpu.core import colorspace as cs
from libplacebo_tpu.core import transfer as tf
from libplacebo_tpu.core.colorspace import (
    BitEncoding, CIExy, ColorLevels, ColorPrimaries, ColorRepr, ColorSystem,
    ColorTransfer, RawPrimaries)


def test_primaries_tables_valid():
    for prim in ColorPrimaries:
        if prim == ColorPrimaries.UNKNOWN:
            continue
        raw = cs.primaries_get(prim)
        assert raw.valid(), prim


def test_rgb2xyz_white_point():
    # white (1,1,1) must map to the white point's XYZ with Y=1
    for prim in (ColorPrimaries.BT_709, ColorPrimaries.BT_2020,
                 ColorPrimaries.DCI_P3, ColorPrimaries.PRO_PHOTO):
        raw = cs.primaries_get(prim)
        M = cs.rgb_to_xyz_matrix(raw)
        XYZ = M.apply([1.0, 1.0, 1.0])
        expect = raw.white.to_XYZ(1.0)
        np.testing.assert_allclose(XYZ, expect, atol=1e-10)


def test_rgb_xyz_roundtrip():
    raw = cs.primaries_get(ColorPrimaries.BT_709)
    M = cs.rgb_to_xyz_matrix(raw)
    Minv = cs.xyz_to_rgb_matrix(raw)
    np.testing.assert_allclose((Minv @ M).m, np.eye(3), atol=1e-12)


def test_luma_coeffs_bt709():
    # Y row for BT.709 must match the standard Kr/Kg/Kb ≈ .2126/.7152/.0722
    w = cs.luma_coeffs(cs.primaries_get(ColorPrimaries.BT_709))
    np.testing.assert_allclose(w, [0.2126, 0.7152, 0.0722], atol=1e-3)


def test_adaptation_identity():
    m = cs.adapt_white_matrix(cs.CIE_D65, cs.CIE_D65)
    np.testing.assert_allclose(m.m, np.eye(3), atol=1e-12)


def test_color_mapping_matrix_identity():
    raw = cs.primaries_get(ColorPrimaries.BT_709)
    m = cs.color_mapping_matrix(raw, raw)
    np.testing.assert_allclose(m.m, np.eye(3), atol=1e-10)


def test_color_mapping_preserves_white():
    src = cs.primaries_get(ColorPrimaries.BT_709)
    dst = cs.primaries_get(ColorPrimaries.BT_2020)
    m = cs.color_mapping_matrix(src, dst)
    np.testing.assert_allclose(m.apply([1, 1, 1]), [1, 1, 1], atol=1e-6)


def test_primaries_superset():
    bt2020 = cs.primaries_get(ColorPrimaries.BT_2020)
    bt709 = cs.primaries_get(ColorPrimaries.BT_709)
    assert cs.primaries_superset(bt2020, bt709)
    assert not cs.primaries_superset(bt709, bt2020)


def test_white_from_temp():
    d65ish = cs.white_from_temp(6504)
    assert abs(d65ish.x - 0.3127) < 2e-3
    assert abs(d65ish.y - 0.3290) < 2e-3


@pytest.mark.parametrize("trc", [t for t in ColorTransfer
                                 if t != ColorTransfer.UNKNOWN])
def test_transfer_roundtrip(trc):
    x = np.linspace(0.0, 1.0, 64)
    lin = np.asarray(tf.linearize(x, trc))
    back = np.asarray(tf.delinearize(lin, trc))
    # float32 precision through pow chains limits PQ/HLG to ~1e-3
    np.testing.assert_allclose(back, x, atol=2e-3)


def test_transfer_monotonic():
    x = np.linspace(0.0, 1.0, 256)
    for trc in ColorTransfer:
        if trc == ColorTransfer.UNKNOWN:
            continue
        lin = np.asarray(tf.linearize(x, trc))
        assert np.all(np.diff(lin) >= -1e-7), trc


def test_pq_peak():
    # PQ signal 1.0 -> 10000 nits -> 10000/203 in NORM units
    peak = float(np.asarray(tf.linearize(np.array(1.0), ColorTransfer.PQ)))
    np.testing.assert_allclose(peak, 10000.0 / 203.0, rtol=1e-5)


def test_hdr_rescale_roundtrip():
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    for scale in HdrScaling:
        x = 0.7
        y = hdr_rescale(HdrScaling.NORM, scale, x)
        back = hdr_rescale(scale, HdrScaling.NORM, y)
        assert abs(back - x) < 1e-6, scale


def test_repr_decode_bt709_limited():
    repr = ColorRepr(sys=ColorSystem.BT_709, levels=ColorLevels.LIMITED,
                     bits=BitEncoding(8, 8, 0))
    tr, out = cs.color_repr_decode(repr)
    # black: Y=16/255, Cb=Cr=128/255 -> (0,0,0)
    black = tr.apply([16 / 255, 128 / 255, 128 / 255])
    np.testing.assert_allclose(black, [0, 0, 0], atol=1e-6)
    # white: Y=235/255 -> (1,1,1)
    white = tr.apply([235 / 255, 128 / 255, 128 / 255])
    np.testing.assert_allclose(white, [1, 1, 1], atol=1e-6)
    assert out.sys == ColorSystem.RGB
    assert out.levels == ColorLevels.FULL


def test_repr_decode_full_range_rgb_identity():
    repr = ColorRepr(sys=ColorSystem.RGB, levels=ColorLevels.FULL,
                     bits=BitEncoding(8, 8, 0))
    tr, _ = cs.color_repr_decode(repr)
    np.testing.assert_allclose(tr.mat.m, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(tr.c, np.zeros(3), atol=1e-12)


def test_repr_decode_10bit_in_16bit():
    # 10-bit color in 16-bit samples: scale pulls up by (2^16-1)/(2^10-1)
    repr = ColorRepr(sys=ColorSystem.RGB, levels=ColorLevels.FULL,
                     bits=BitEncoding(16, 10, 0))
    scale, norm = cs.color_repr_normalize(repr)
    np.testing.assert_allclose(scale, (2**16 - 1) / (2**10 - 1))
    assert norm.bits.color_depth == 16


def test_repr_decode_ycbcr_10bit_limited():
    repr = ColorRepr(sys=ColorSystem.BT_2020_NC, levels=ColorLevels.LIMITED,
                     bits=BitEncoding(10, 10, 0))
    tr, _ = cs.color_repr_decode(repr, ColorPrimaries.BT_2020)
    black = tr.apply([64 / 1023, 512 / 1023, 512 / 1023])
    np.testing.assert_allclose(black, [0, 0, 0], atol=1e-6)
    white = tr.apply([940 / 1023, 512 / 1023, 512 / 1023])
    np.testing.assert_allclose(white, [1, 1, 1], atol=1e-6)


def test_ycbcr_matrix_red():
    # pure red: R=1,G=B=0 should roundtrip through the YCbCr matrix
    repr = ColorRepr(sys=ColorSystem.BT_709, levels=ColorLevels.FULL,
                     bits=BitEncoding(8, 8, 0))
    tr, _ = cs.color_repr_decode(repr)
    kr, kb = 0.2126, 0.0722
    # encode red manually with the reference's full-range convention
    # (center 128/255, positive excursion stretched to +0.5 at MAX_INT;
    # pl_color_repr_decode, golden-verified): signal = c/cmul + cmid
    cmid = 128 / 255
    cmul = 0.5 / (1.0 - cmid)
    y = kr
    cb = -kr / (2 * (1 - kb)) / cmul + cmid
    cr = 0.5 / cmul + cmid
    rgb = tr.apply([y, cb, cr])
    np.testing.assert_allclose(rgb, [1, 0, 0], atol=1e-6)


def test_infer_defaults():
    inferred = cs.ColorSpace().infer(1920, 1080)
    assert inferred.primaries == ColorPrimaries.BT_709
    assert inferred.transfer == ColorTransfer.BT_1886
    assert inferred.hdr.max_luma == cs.COLOR_SDR_WHITE


def test_infer_hdr():
    inferred = cs.CSP_BT2100_PQ.infer()
    assert inferred.hdr.max_luma == 10000.0
    assert inferred.hdr.min_luma == cs.COLOR_HDR_BLACK


def test_system_guess():
    assert cs.system_guess_ycbcr(1920, 1080) == ColorSystem.BT_709
    assert cs.system_guess_ycbcr(720, 480) == ColorSystem.BT_601


def test_levels_guess():
    assert cs.levels_guess(ColorRepr(sys=ColorSystem.BT_709)) == \
        ColorLevels.LIMITED
    assert cs.levels_guess(ColorRepr(sys=ColorSystem.RGB)) == \
        ColorLevels.FULL


def test_merge():
    a = ColorRepr(sys=ColorSystem.BT_709)
    b = ColorRepr(levels=ColorLevels.FULL)
    m = a.merge(b)
    assert m.sys == ColorSystem.BT_709
    assert m.levels == ColorLevels.FULL


def test_white_point_loci():
    # daylight locus (reference pl_daylight_from_temp): D65 at 6504K
    d65 = cs.daylight_from_temp(6504)
    assert abs(d65.x - 0.3127) < 2e-3 and abs(d65.y - 0.3290) < 2e-3
    # blackbody locus (reference pl_blackbody_from_temp): Planckian
    # point at 2856K (illuminant A) is near (0.4476, 0.4074)
    a = cs.blackbody_from_temp(2856)
    assert abs(a.x - 0.4476) < 4e-3 and abs(a.y - 0.4074) < 4e-3
    # white_from_temp blends: pure blackbody at/below 2500K, pure
    # daylight at/above 4000K (reference pl_white_from_temp)
    lo = cs.white_from_temp(2000)
    assert lo.x == cs.blackbody_from_temp(2000).x
    hi = cs.white_from_temp(6500)
    assert hi.x == cs.daylight_from_temp(6500).x
    mid = cs.white_from_temp(3000)
    bx, dx = cs.blackbody_from_temp(3000).x, cs.daylight_from_temp(3000).x
    assert min(bx, dx) <= mid.x <= max(bx, dx)


def test_is_black_scaled_table():
    # reference pl_color_space_is_black_scaled (colorspace.c:525)
    scaled = [ColorTransfer.UNKNOWN, ColorTransfer.SRGB,
              ColorTransfer.LINEAR, ColorTransfer.GAMMA22,
              ColorTransfer.PRO_PHOTO, ColorTransfer.ST428,
              ColorTransfer.HLG]
    unscaled = [ColorTransfer.BT_1886, ColorTransfer.PQ,
                ColorTransfer.SCRGB, ColorTransfer.V_LOG,
                ColorTransfer.S_LOG1, ColorTransfer.S_LOG2]
    for t in scaled:
        assert cs.ColorSpace(transfer=t).is_black_scaled(), t
    for t in unscaled:
        assert not cs.ColorSpace(transfer=t).is_black_scaled(), t


def test_infer_ref():
    # unknown target against a wide-gamut HDR source -> BT.709 + BT.1886
    src = cs.CSP_BT2100_PQ
    dst = cs.ColorSpace().infer_ref(src)
    assert dst.primaries == ColorPrimaries.BT_709
    assert dst.transfer == ColorTransfer.BT_1886
    # SDR gamma curves are re-used directly
    dst2 = cs.ColorSpace().infer_ref(cs.CSP_SRGB)
    assert dst2.transfer == ColorTransfer.SRGB
    # narrow-gamut ref primaries are copied
    dst3 = cs.ColorSpace().infer_ref(cs.CSP_BT709)
    assert dst3.primaries == ColorPrimaries.BT_709


def test_infer_map():
    # HLG -> HDR display: source OOTF peak tunes to the display
    src_hlg = cs.CSP_BT2020_HLG
    dst_hdr = cs.ColorSpace(ColorPrimaries.BT_2020, ColorTransfer.PQ,
                            cs.HdrMetadata(max_luma=800.0))
    s, d = cs.color_space_infer_map(src_hlg, dst_hdr)
    assert s.hdr.max_luma == d.hdr.max_luma == 800.0
    # BT.1886 source with unknown contrast adopts the target's black
    dst_known = cs.ColorSpace(ColorPrimaries.BT_709, ColorTransfer.SRGB,
                              cs.HdrMetadata(min_luma=0.05, max_luma=100.0))
    s2, d2 = cs.color_space_infer_map(cs.CSP_BT709, dst_known)
    assert s2.hdr.min_luma == 0.05
    # SDR->SDR with unknown dst contrast: dst shares the src black
    src_sdr = cs.ColorSpace(ColorPrimaries.BT_709, ColorTransfer.BT_1886,
                            cs.HdrMetadata(min_luma=0.1, max_luma=100.0))
    s3, d3 = cs.color_space_infer_map(src_sdr, cs.ColorSpace())
    assert d3.hdr.min_luma == 0.1


def test_hdr_metadata_merge_contains():
    """Reference pl_hdr_metadata_merge/contains (colorspace.c:447,471)."""
    from libplacebo_tpu.core.colorspace import HdrMetadata, HdrBezier
    a = HdrMetadata(max_luma=1000.0)
    b = HdrMetadata(min_luma=0.005, max_luma=4000.0, max_cll=800.0,
                    scene_max=(100.0, 200.0, 150.0), scene_avg=40.0,
                    ootf=HdrBezier(target_luma=400.0),
                    max_pq_y=0.8, avg_pq_y=0.3)
    m = a.merge(b)
    assert m.max_luma == 1000.0          # kept (set in a)
    assert m.min_luma == 0.005           # filled from b
    assert m.max_cll == 800.0
    assert m.scene_max == (100.0, 200.0, 150.0)
    assert m.ootf is b.ootf
    assert m.max_pq_y == 0.8

    assert a.contains("hdr10")
    assert not a.contains("hdr10plus")
    assert not a.contains("cie_y")
    assert b.contains("hdr10plus") and b.contains("cie_y")
    assert HdrMetadata().contains("none")
    assert not HdrMetadata().contains("any")
    with pytest.raises(ValueError):
        a.contains("bogus")


def test_raw_primaries_merge_similar():
    """Reference pl_raw_primaries_merge/similar (colorspace.c:1073,1088)."""
    from libplacebo_tpu.core.colorspace import (
        CIExy, ColorPrimaries, RawPrimaries, primaries_get)
    p709 = primaries_get(ColorPrimaries.BT_709)
    partial = RawPrimaries(red=CIExy(0.7, 0.3))
    m = partial.merge(p709)
    assert m.red == CIExy(0.7, 0.3)            # kept
    assert m.green == p709.green               # filled
    assert m.white == p709.white
    # similar: within 0.001 total chromaticity delta
    nudged = RawPrimaries(CIExy(p709.red.x + 0.0004, p709.red.y),
                          p709.green, p709.blue, p709.white)
    assert p709.similar(nudged)
    p2020 = primaries_get(ColorPrimaries.BT_2020)
    assert not p709.similar(p2020)
    assert p709.similar(p709)
