"""Device gamut mapping tests: fitted boundaries vs exact bisection,
operator behavior, renderer integration."""
import math

import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core import gamut_mapping as gm
from libplacebo_tpu.core.colorspace import (ColorPrimaries, HdrScaling,
                                            color_mapping_matrix,
                                            hdr_rescale, primaries_get)
from libplacebo_tpu.ops import gamut as og

MIN_L = 0.0
MAX_L = float(hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0))
TO_NORM = 203.0 / 10000.0


@pytest.fixture(scope="module")
def bounds():
    return (og.fit_boundary(primaries_get(ColorPrimaries.BT_2020),
                            MIN_L, MAX_L),
            og.fit_boundary(primaries_get(ColorPrimaries.BT_709),
                            MIN_L, MAX_L))


def test_boundary_fit_accuracy(bounds):
    _, b709 = bounds
    g = gm._Gamut(primaries_get(ColorPrimaries.BT_709), MIN_L, MAX_L)
    Is = np.linspace(MIN_L + 0.01, MAX_L - 0.01, 19)
    hs = np.linspace(-math.pi, math.pi, 31)
    exact = gm._desat_bounded(Is[None, :], hs[:, None], 0.0, 0.5, g)[..., 1]
    I = jnp.asarray(np.broadcast_to(Is[None, :], exact.shape)
                    .astype(np.float32))
    h = jnp.asarray(np.broadcast_to(hs[:, None], exact.shape)
                    .astype(np.float32))
    fitted = np.asarray(og._boundary_eval_dev(b709, I, h))
    err = np.abs(fitted - exact)
    assert err.mean() < 0.006
    assert err.max() < 0.05


def test_ich_roundtrip_device(bounds):
    _, b709 = bounds
    rng = np.random.default_rng(0)
    rgb = jnp.asarray((rng.random((3, 8, 8)) * 0.02).astype(np.float32))
    I, C, cos_h, sin_h = og._rgb2ich_dev(rgb, b709)
    back = og._ich2rgb_dev(I, C, cos_h, sin_h, b709)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=5e-4)


def _oog_frame(bounds):
    """BT.2020 colors matrixed into BT.709 => some out of gamut."""
    rng = np.random.default_rng(1)
    rgb2020 = (rng.random((3, 16, 16)) * 0.9).astype(np.float32)
    m = color_mapping_matrix(primaries_get(ColorPrimaries.BT_2020),
                             primaries_get(ColorPrimaries.BT_709)).m
    return jnp.einsum("ck,khw->chw", jnp.asarray(m.astype(np.float32)),
                      jnp.asarray(rgb2020))


@pytest.mark.parametrize("fn", ["clip", "perceptual", "softclip",
                                "relative", "desaturate", "saturation",
                                "linear", "darken"])
def test_operators_produce_in_range(bounds, fn):
    b2020, b709 = bounds
    rgb = _oog_frame(bounds)
    out = np.asarray(og.map_gamut(rgb, fn, b2020, b709, to_norm=TO_NORM))
    assert np.all(np.isfinite(out))
    assert out.min() >= -1e-3
    assert out.max() <= (b709.max_rgb / TO_NORM) + 1e-2


def test_in_gamut_colors_preserved(bounds):
    """Colors deep inside the gamut should pass (nearly) unchanged
    through the soft operators."""
    b2020, b709 = bounds
    gray = jnp.full((3, 8, 8), 0.4, jnp.float32)   # achromatic, in gamut
    for fn in ("perceptual", "softclip", "relative", "desaturate"):
        out = np.asarray(og.map_gamut(gray, fn, b2020, b709,
                                      to_norm=TO_NORM))
        np.testing.assert_allclose(out, 0.4, atol=5e-3, err_msg=fn)


def test_out_of_gamut_gets_compressed(bounds):
    b2020, b709 = bounds
    rgb = _oog_frame(bounds)
    before_min = float(rgb.min())
    out = og.map_gamut(rgb, "perceptual", b2020, b709, to_norm=TO_NORM)
    after_min = float(out.min())
    assert before_min < -0.01           # input had meaningful negatives
    # output bounded by min_rgb (= -1e-6 epsilon, scaled by 1/to_norm)
    assert after_min > -1e-4


def test_renderer_gamut_integration():
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.render.renderer import (Renderer, RenderParams,
                                                Target)
    from libplacebo_tpu.core.colorspace import (ColorSpace, ColorTransfer)
    rng = np.random.default_rng(2)
    rgb = rng.random((24, 24, 3)).astype(np.float32)
    frame = frame_from_rgb(rgb, color=ColorSpace(
        ColorPrimaries.BT_2020, ColorTransfer.SRGB))
    tgt = Target(w=24, h=24, color=ColorSpace(
        ColorPrimaries.BT_709, ColorTransfer.SRGB))
    for fn in ("perceptual", "clip", "desaturate"):
        out = Renderer().render(frame, tgt,
                                RenderParams(gamut_mapping=fn,
                                             peak_detect=None))
        o = np.asarray(out)
        assert np.all(np.isfinite(o)) and o.min() >= 0 and o.max() <= 1, fn


def test_hueshift_fourier_matches_spline(bounds):
    """The Fourier fit of the hue-shift delta matches the reference's
    cubic spline (hueshift_prepare/apply, gamut_mapping.c:628-700)."""
    b2020, b709 = bounds
    coefs = og._hueshift_fourier(b2020, b709)
    assert coefs is not None          # 2020 -> 709 shifts hues
    gs = gm._Gamut(primaries_get(ColorPrimaries.BT_2020), MIN_L, MAX_L)
    gd = gm._Gamut(primaries_get(ColorPrimaries.BT_709), MIN_L, MAX_L)
    table = gm._hueshift_prepare(gs, gd)
    hs = np.linspace(-math.pi, math.pi, 257)
    exact = gm._hueshift_apply(table, hs) - hs
    F = og._fourier_design(hs)
    fitted = F @ np.asarray(coefs)
    # 12 harmonics capture the 12-knot spline to ~0.011 rad (0.64 deg);
    # the reference's own 3DLUT quantizes hue more coarsely than that
    assert np.abs(fitted - exact).max() < 1.5e-2
    # identity pair: no shift
    assert og._hueshift_fourier(b709, b709) is None


def test_softclip_hueshift_behavior(bounds):
    """Device softclip shifts the hue of saturated out-of-gamut colors
    (toward the dst gamut's hue at the same refpoint) but leaves
    achromatic and in-gamut colors alone."""
    b2020, b709 = bounds
    rgb = _oog_frame(bounds)
    out = np.asarray(og.map_gamut(rgb, "softclip", b2020, b709,
                                  to_norm=TO_NORM))
    assert np.all(np.isfinite(out))
    # hue actually moved for the most out-of-gamut pixel
    x = np.asarray(rgb) * TO_NORM
    I0, C0, ch0, sh0 = (np.asarray(v) for v in og._rgb2ich_dev(
        jnp.asarray(x), b709))
    I1, C1, ch1, sh1 = (np.asarray(v) for v in og._rgb2ich_dev(
        jnp.asarray(out * TO_NORM), b709))
    oog = C0 > np.asarray(og._boundary_eval_dev(
        b709, jnp.asarray(I0), h=jnp.asarray(np.arctan2(sh0, ch0))))
    # hue angle change where strongly out of gamut
    dh = np.abs(np.arctan2(sh1, ch1) - np.arctan2(sh0, ch0))
    dh = np.minimum(dh, 2 * np.pi - dh)
    assert dh[oog].max() > 2e-3      # some hue movement happened
    # gray stays gray (no hue shift, no chroma invented)
    gray = jnp.full((3, 4, 4), 0.4, jnp.float32)
    outg = np.asarray(og.map_gamut(gray, "softclip", b2020, b709,
                                   to_norm=TO_NORM))
    np.testing.assert_allclose(outg, 0.4, atol=5e-3)


def test_absolute_device(bounds):
    """absolute = inverse chromatic adaptation + relative clip: equals
    relative when the white points match, stays in range, and shifts
    achromatic colors when the whites differ."""
    b2020, b709 = bounds
    rgb = _oog_frame(bounds)
    out = np.asarray(og.map_gamut(rgb, "absolute", b2020, b709,
                                  to_norm=TO_NORM))
    assert np.all(np.isfinite(out))
    assert out.min() >= -1e-3
    assert out.max() <= (b709.max_rgb / TO_NORM) + 1e-2
    # same white point (both D65): absolute == relative
    rel = np.asarray(og.map_gamut(rgb, "relative", b2020, b709,
                                  to_norm=TO_NORM))
    # identity adaptation still takes one extra f32 RGB->ICh->RGB
    # PQ roundtrip vs the direct relative path: ~3e-4 noise
    np.testing.assert_allclose(out, rel, atol=1e-3)
    # different white: build a DCI-P3 (theater white) destination
    from libplacebo_tpu.core.colorspace import ColorPrimaries, primaries_get
    prim_dci = primaries_get(ColorPrimaries.DCI_P3)
    b_dci = og.fit_boundary(prim_dci, MIN_L, MAX_L)
    gray = jnp.full((3, 4, 4), 0.35, jnp.float32)
    out_abs = np.asarray(og.map_gamut(gray, "absolute", b2020, b_dci,
                                      to_norm=TO_NORM))
    out_rel = np.asarray(og.map_gamut(gray, "relative", b2020, b_dci,
                                      to_norm=TO_NORM))
    assert np.abs(out_abs - out_rel).max() > 1e-3


def test_highlight_device(bounds):
    """highlight leaves in-gamut pixels untouched and recolors
    out-of-gamut ones exactly like the host oracle formula."""
    b2020, b709 = bounds
    gray = jnp.full((3, 4, 4), 0.4, jnp.float32)
    out = np.asarray(og.map_gamut(gray, "highlight", b2020, b709,
                                  to_norm=TO_NORM))
    np.testing.assert_allclose(out, 0.4, atol=1e-4)

    rgb = _oog_frame(bounds)
    out = np.asarray(og.map_gamut(rgb, "highlight", b2020, b709,
                                  to_norm=TO_NORM))
    # host oracle: same formula through core.gamut_mapping primitives
    x = np.moveaxis(np.asarray(rgb), 0, -1) * TO_NORM
    g = gm._Gamut(primaries_get(ColorPrimaries.BT_709), MIN_L, MAX_L)
    ipt = gm._rgb2ipt(x, g)
    from libplacebo_tpu.core.gamut_mapping import GamutMapParams
    bad = ~gm._ingamut(ipt, g)
    hi = np.stack([np.minimum(ipt[..., 0] + 0.1, 1.0),
                   np.clip(-1.2 * ipt[..., 1], -0.5, 0.5),
                   np.clip(-1.2 * ipt[..., 2], -0.5, 0.5)], axis=-1)
    ref_ipt = np.where(bad[..., None], hi, ipt)
    ref = np.moveaxis(gm._ipt2rgb(ref_ipt, g), -1, 0) / TO_NORM
    # knife-edge ingamut pixels may flip between float paths: compare
    # away from the boundary
    diff = np.abs(out - ref)
    assert (diff.max(axis=0) < 1e-3).mean() > 0.97
    # f32 device vs f64 host-oracle PQ roundtrips: ~5e-5 noise floor
    assert np.median(diff) < 3e-4
