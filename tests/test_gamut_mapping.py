"""Gamut mapping invariants. The reference has no dedicated unit test file
for gamut_mapping.c (covered via shader tests); these tests verify the
mathematical contracts directly."""
import numpy as np
import pytest

from libplacebo_tpu.core import gamut_mapping as gm
from libplacebo_tpu.core.colorspace import ColorPrimaries, primaries_get


def _params(fun, src=ColorPrimaries.BT_2020, dst=ColorPrimaries.BT_709,
            NI=9, NC=9, Nh=17):
    return gm.GamutMapParams(
        function=fun,
        input_gamut=primaries_get(src),
        output_gamut=primaries_get(dst),
        min_luma=0.0, max_luma=0.58,  # ~203 nits in PQ
        lut_size_I=NI, lut_size_C=NC, lut_size_h=Nh)


def test_ipt_roundtrip():
    prim = primaries_get(ColorPrimaries.BT_709)
    g = gm._Gamut(prim, 0.0, 0.58)
    rgb = np.array([[0.2, 0.5, 0.1], [0.9, 0.9, 0.9], [0.01, 0.02, 0.03]])
    ipt = gm._rgb2ipt(rgb, g)
    back = gm._ipt2rgb(ipt, g)
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_ich_roundtrip():
    ipt = np.array([[0.5, 0.1, -0.2], [0.3, 0.0, 0.0]])
    np.testing.assert_allclose(gm._ich2ipt(gm._ipt2ich(ipt)), ipt, atol=1e-12)


def test_ingamut_basic():
    # NB: linear RGB here is normalized to 10k nits; max_luma 0.58 PQ
    # corresponds to ~203 nits = 0.0203
    prim = primaries_get(ColorPrimaries.BT_709)
    g = gm._Gamut(prim, 0.0, 0.58)
    mid_gray = gm._rgb2ipt(np.array([0.01, 0.01, 0.01]), g)
    assert gm._ingamut(mid_gray, g)
    # a color way outside: huge chroma
    bad = mid_gray + np.array([0.0, 0.8, 0.0])
    assert not gm._ingamut(bad, g)


def test_desat_bounded_on_boundary():
    prim = primaries_get(ColorPrimaries.BT_709)
    g = gm._Gamut(prim, 0.0, 0.58)
    res = gm._desat_bounded(np.array([0.3]), np.array([1.0]), 0.0, 0.5, g)
    # result should be in gamut, but res.C + eps outside
    assert gm._ingamut(gm._ich2ipt(res), g).all()
    bumped = res.copy()
    bumped[..., 1] += 1e-3
    assert not gm._ingamut(gm._ich2ipt(bumped), g).any()


def test_saturate_peak():
    prim = primaries_get(ColorPrimaries.BT_709)
    g = gm._Gamut(prim, 0.0, 0.58)
    hues = np.linspace(-np.pi, np.pi, 8)
    peaks = gm._saturate(hues, g)
    assert np.all(peaks[..., 1] > 0.01)      # meaningful chroma
    assert gm._ingamut(gm._ich2ipt(peaks), g).all()


@pytest.mark.parametrize("fun", gm.GAMUT_MAP_FUNCTIONS,
                         ids=lambda f: f.name)
def test_generate_all_operators(fun):
    p = _params(fun)
    lut = gm.generate(p)
    assert lut.shape == (p.lut_size_h, p.lut_size_C, p.lut_size_I, 3)
    assert np.all(np.isfinite(lut))


def test_clip_is_noop_map():
    p = _params(gm.GAMUT_MAP_CLIP)
    lut = gm.generate(p)
    # clip leaves the IPT grid unchanged
    import math
    Ix = np.linspace(p.min_luma, p.max_luma, p.lut_size_I)
    hx = np.linspace(-math.pi, math.pi, p.lut_size_h)
    np.testing.assert_allclose(lut[0, 0, :, 0], Ix, atol=1e-6)


def test_mapped_colors_in_gamut():
    # desaturate guarantees in-gamut output
    p = _params(gm.GAMUT_MAP_DESATURATE)
    lut = gm.generate(p)
    dst = gm._Gamut(p.output_gamut, p.min_luma, p.max_luma)
    rgb = gm._ipt2rgb(lut.astype(np.float64), dst)
    assert np.all(rgb >= dst.min_rgb - 2e-2)
    assert np.all(rgb <= dst.max_rgb + 2e-2)


def test_saturation_mapping_white():
    # saturation mapping maps src white to dst white
    p = _params(gm.GAMUT_MAP_SATURATION)
    src = gm._Gamut(p.input_gamut, p.min_luma, p.max_luma)
    dst = gm._Gamut(p.output_gamut, p.min_luma, p.max_luma)
    white_ipt = gm._rgb2ipt(np.array([0.1, 0.1, 0.1]), src)
    mapped = gm.sample(white_ipt, p)
    back = gm._ipt2rgb(mapped.astype(np.float64), dst)
    np.testing.assert_allclose(back, 0.1, atol=1e-4)


def test_params_noop():
    same = gm.GamutMapParams(
        function=gm.GAMUT_MAP_RELATIVE,
        input_gamut=primaries_get(ColorPrimaries.BT_709),
        output_gamut=primaries_get(ColorPrimaries.BT_709))
    assert gm.params_noop(same)
    diff = _params(gm.GAMUT_MAP_RELATIVE)
    assert not gm.params_noop(diff)


def test_find_by_name():
    assert gm.find_gamut_map_function("perceptual") is gm.GAMUT_MAP_PERCEPTUAL
    assert len(gm.GAMUT_MAP_FUNCTIONS) == 10


def test_native_lut_matches_python():
    """native/gamut.cc vs the pure-Python generate() on every operator.
    Exact for operators whose searches run at grid hues; the softclip/
    absolute/darken family evaluates saturate() at shifted hues where
    the reference's 1-item peak cache (gamut_mapping.c:263,513 — 1e-3
    hue tolerance, faithfully mirrored in C++) introduces a bounded
    deviation."""
    import os
    import numpy as np
    from libplacebo_tpu import native
    from libplacebo_tpu.core import gamut_mapping as gm
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                primaries_get)
    if native.gamut_lut_native is None or not native.available():
        import pytest
        pytest.skip("native library unavailable")
    tol = {"softclip": 5e-4, "absolute": 5e-4, "darken": 5e-3}
    for name in ("clip", "perceptual", "softclip", "relative",
                 "saturation", "absolute", "desaturate", "darken",
                 "highlight", "linear"):
        p = gm.GamutMapParams(
            function=gm.find_gamut_map_function(name),
            input_gamut=primaries_get(ColorPrimaries.BT_2020),
            output_gamut=primaries_get(ColorPrimaries.BT_709),
            min_luma=float(gm._pq_oetf(0.005 / 1e4)),
            max_luma=float(gm._pq_oetf(1.0)),
            lut_size_I=12, lut_size_C=8, lut_size_h=16)
        os.environ["LPTPU_NATIVE_GAMUT"] = "0"
        try:
            ref = gm.generate(p)
        finally:
            os.environ.pop("LPTPU_NATIVE_GAMUT", None)
        nat = gm.generate(p)
        np.testing.assert_allclose(nat, ref, atol=tol.get(name, 1e-6),
                                   err_msg=name)
