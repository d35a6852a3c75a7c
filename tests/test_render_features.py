"""Renderer feature tests: rotation, backgrounds/borders, overlays,
contrast recovery, Dolby Vision reshaping, deinterlace integration."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core.colorspace import (CSP_BT2100_PQ, CSP_SRGB,
                                            BitEncoding, ColorLevels,
                                            ColorRepr, ColorSystem,
                                            DoviMetadata)
from libplacebo_tpu.core.common import Rect, RectF, Rotation
from libplacebo_tpu.render.frame import (Frame, Overlay, Plane,
                                         frame_from_rgb,
                                         frame_from_yuv420p)
from libplacebo_tpu.render.renderer import (Renderer, RenderParams, Target)


def _rgb_frame(h=32, w=48, seed=0, **kw):
    rng = np.random.default_rng(seed)
    return frame_from_rgb(rng.random((h, w, 3)).astype(np.float32),
                          color=CSP_SRGB, **kw)


def _params(**kw):
    kw.setdefault("peak_detect", None)
    kw.setdefault("dither", None)
    return RenderParams(**kw)


def test_rotation():
    f = _rgb_frame(16, 32)
    f.rotation = Rotation(1)
    f.crop = RectF(0, 0, 16, 32)     # crop in rotated space (32x16 -> rot)
    out = Renderer().render(f, Target(w=16, h=32, color=CSP_SRGB),
                            _params())
    expect = np.rot90(np.asarray(f.planes[0].data), k=1, axes=(-2, -1))
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-2)


def test_background_solid():
    f = _rgb_frame(16, 16)
    tgt = Target(w=32, h=32, color=CSP_SRGB,
                 crop=RectF(8, 8, 24, 24))
    p = _params(background_color=(1.0, 0.0, 0.0))
    out = np.asarray(Renderer().render(f, tgt, p))
    assert out.shape == (3, 32, 32)
    # corners are background red
    np.testing.assert_allclose(out[:, 0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[:, -1, -1], [1, 0, 0], atol=1e-6)
    # center contains the image
    np.testing.assert_allclose(out[:, 8:24, 8:24],
                               np.asarray(f.planes[0].data), atol=2e-2)


def test_background_tiles():
    f = _rgb_frame(8, 8)
    tgt = Target(w=64, h=64, color=CSP_SRGB, crop=RectF(28, 28, 36, 36))
    p = _params(background="tiles", tile_size=16)
    out = np.asarray(Renderer().render(f, tgt, p))
    # two distinct tile colors present in the border
    border_vals = np.unique(out[0, 0, :])
    assert len(border_vals) == 2


def test_overlay_blend():
    f = _rgb_frame(32, 32, seed=1)
    ov_data = np.zeros((4, 8, 8), np.float32)
    ov_data[1] = 1.0    # green
    ov_data[3] = 1.0    # opaque
    f.overlays = [Overlay(data=jnp.asarray(ov_data),
                          rect=RectF(4, 4, 12, 12))]
    out = np.asarray(Renderer().render(
        f, Target(w=32, h=32, color=CSP_SRGB), _params()))
    np.testing.assert_allclose(out[:, 6, 6], [0, 1, 0], atol=1e-5)
    # outside the overlay: original image
    src = np.asarray(f.planes[0].data)
    np.testing.assert_allclose(out[:, 20, 20], src[:, 20, 20], atol=2e-2)


def test_overlay_alpha():
    f = _rgb_frame(16, 16, seed=2)
    ov = np.zeros((4, 4, 4), np.float32)
    ov[0] = 1.0
    ov[3] = 0.5   # half transparent red
    f.overlays = [Overlay(data=jnp.asarray(ov), rect=RectF(0, 0, 4, 4))]
    out = np.asarray(Renderer().render(
        f, Target(w=16, h=16, color=CSP_SRGB), _params()))
    src = np.asarray(f.planes[0].data)
    expect = 0.5 * 1.0 + 0.5 * src[0, 2, 2]
    np.testing.assert_allclose(out[0, 2, 2], expect, atol=2e-2)


def test_contrast_recovery_runs():
    rng = np.random.default_rng(3)
    y = (rng.random((48, 64)) * 219 + 16).astype(np.uint8)
    u = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    v = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    f = frame_from_yuv420p(y, u, v, color=CSP_BT2100_PQ,
                           repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                                          levels=ColorLevels.LIMITED,
                                          bits=BitEncoding(8, 8, 0)))
    tgt = Target(w=64, h=48, color=CSP_SRGB)
    out0 = np.asarray(Renderer().render(f, tgt, _params()))
    out1 = np.asarray(Renderer().render(
        f, tgt, _params(contrast_recovery=0.8)))
    assert np.all(np.isfinite(out1))
    assert not np.array_equal(out0, out1)   # recovery changes the result
    # high-frequency detail increases (local variance)
    def hf(x):
        return np.abs(np.diff(x, axis=-1)).mean()
    assert hf(out1) >= hf(out0) * 0.9


def test_dovi_reshape_identity():
    from libplacebo_tpu.ops.dovi import dovi_reshape
    comp_id = dict(num_pivots=2, pivots=(0.0, 1.0), method=(0,),
                   poly_coeffs=((0.0, 1.0, 0.0),),
                   mmr_order=(1,), mmr_constant=(0.0,),
                   mmr_coeffs=(((0.0,) * 7,),))
    dovi = DoviMetadata(comp=(comp_id, comp_id, comp_id))
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((3, 8, 8)).astype(np.float32))
    out = dovi_reshape(img, dovi)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_dovi_reshape_poly_segments():
    from libplacebo_tpu.ops.dovi import dovi_reshape
    # two segments: [0,0.5) -> 2x, [0.5,1] -> 0.5x + 0.25
    comp = dict(num_pivots=3, pivots=(0.0, 0.5, 1.0), method=(0, 0),
                poly_coeffs=((0.0, 2.0, 0.0), (0.25, 0.5, 0.0)),
                mmr_order=(1, 1), mmr_constant=(0, 0),
                mmr_coeffs=(((0.0,) * 7,), ((0.0,) * 7,)))
    ident = dict(num_pivots=2, pivots=(0.0, 1.0), method=(0,),
                 poly_coeffs=((0.0, 1.0, 0.0),),
                 mmr_order=(1,), mmr_constant=(0.0,),
                 mmr_coeffs=(((0.0,) * 7,),))
    dovi = DoviMetadata(comp=(comp, ident, ident))
    img = jnp.asarray(np.array([[[0.25]], [[0.3]], [[0.3]]], np.float32))
    out = np.asarray(dovi_reshape(img, dovi))
    assert abs(out[0, 0, 0] - 0.5) < 1e-6     # 0.25 * 2
    img2 = jnp.asarray(np.array([[[0.8]], [[0.3]], [[0.3]]], np.float32))
    out2 = np.asarray(dovi_reshape(img2, dovi))
    assert abs(out2[0, 0, 0] - (0.25 + 0.4)) < 1e-5


def test_dovi_mmr():
    from libplacebo_tpu.ops.dovi import dovi_reshape
    # MMR segment: s = 0.1 + 0.5*y + 0.25*u*v
    coeffs = np.zeros((1, 7), np.float32)
    coeffs[0, 0] = 0.5      # y
    coeffs[0, 5] = 0.25     # u*v  (yz term for component order y,u,v)
    comp = dict(num_pivots=2, pivots=(0.0, 1.0), method=(1,),
                poly_coeffs=((0, 0, 0),), mmr_order=(1,),
                mmr_constant=(0.1,), mmr_coeffs=(tuple(map(tuple, coeffs)),))
    ident = dict(num_pivots=2, pivots=(0.0, 1.0), method=(0,),
                 poly_coeffs=((0.0, 1.0, 0.0),),
                 mmr_order=(1,), mmr_constant=(0.0,),
                 mmr_coeffs=(((0.0,) * 7,),))
    dovi = DoviMetadata(comp=(comp, ident, ident))
    img = jnp.asarray(np.array([[[0.4]], [[0.5]], [[0.6]]], np.float32))
    out = np.asarray(dovi_reshape(img, dovi))
    expect = 0.1 + 0.5 * 0.4 + 0.25 * 0.5 * 0.6
    assert abs(out[0, 0, 0] - expect) < 1e-6


def test_deinterlace_in_renderer():
    from libplacebo_tpu.ops.deinterlace import (DeinterlaceAlgo,
                                                DeinterlaceParams, Field)
    f = _rgb_frame(32, 32, seed=5)
    f.field = Field.TOP
    p = _params(deinterlace=DeinterlaceParams(DeinterlaceAlgo.BOB))
    out = np.asarray(Renderer().render(
        f, Target(w=32, h=32, color=CSP_SRGB), p))
    src = np.asarray(f.planes[0].data)
    # bob: odd lines replaced by line above
    np.testing.assert_allclose(out[:, 1::2], src[:, 0:-1:2], atol=2e-2)


def test_dovi_full_render_no_recompile():
    """Dolby Vision frames with per-frame RPU changes share one compiled
    pipeline (coefficients are traced arrays)."""
    import dataclasses
    from libplacebo_tpu.core.colorspace import (ColorSpace, ColorPrimaries,
                                                ColorTransfer)
    comp = dict(num_pivots=2, pivots=(0.0, 1.0), method=(0,),
                poly_coeffs=((0.0, 1.1, 0.0),),
                mmr_order=(1,), mmr_constant=(0.0,),
                mmr_coeffs=(((0.0,) * 7,),))
    nl = tuple(map(tuple, np.eye(3)))
    dovi1 = DoviMetadata(nonlinear=nl, linear=nl,
                         nonlinear_offset=(0.0, 0.0, 0.0),
                         comp=(comp, comp, comp))
    comp2 = dict(comp, poly_coeffs=((0.05, 0.9, 0.0),))
    dovi2 = DoviMetadata(nonlinear=nl, linear=nl,
                         nonlinear_offset=(0.0, 0.0, 0.0),
                         comp=(comp2, comp2, comp2))

    rng = np.random.default_rng(7)
    rgb = rng.random((3, 24, 32)).astype(np.float32) * 0.5
    planes = [Plane(data=jnp.asarray(rgb), component_mapping=(0, 1, 2))]
    csp = ColorSpace(ColorPrimaries.BT_2020, ColorTransfer.PQ)

    def mkframe(dovi):
        return Frame(planes=planes,
                     repr=ColorRepr(sys=ColorSystem.DOLBYVISION,
                                    levels=ColorLevels.FULL,
                                    bits=BitEncoding(12, 12, 0),
                                    dovi=dovi),
                     color=csp)

    r = Renderer()
    tgt = Target(w=32, h=24, color=CSP_SRGB)
    out1 = np.asarray(r.render(mkframe(dovi1), tgt, _params()))
    n = len(r._cache)
    out2 = np.asarray(r.render(mkframe(dovi2), tgt, _params()))
    assert len(r._cache) == n              # no recompile
    assert not np.array_equal(out1, out2)  # RPU change took effect
    assert np.all(np.isfinite(out1)) and np.all(np.isfinite(out2))


def test_phased_tail_matches_interleaved(monkeypatch):
    """LPTPU_PHASED_TAIL=1 runs the pointwise tail in EWA phase-block
    layout; output must equal the default interleaved path exactly."""
    import os
    import numpy as np
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB)
    from libplacebo_tpu.ops.peak_detect import PeakDetectParams
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    rng = np.random.default_rng(3)
    src_h, src_w = 64, 96
    y = (rng.random((src_h, src_w)) * 219 + 16).astype(np.uint8)
    u = (rng.random((src_h // 2, src_w // 2)) * 224 + 16).astype(np.uint8)
    v = (rng.random((src_h // 2, src_w // 2)) * 224 + 16).astype(np.uint8)
    frame = frame_from_yuv420p(
        y, u, v, color=CSP_BT2100_PQ,
        repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                       levels=ColorLevels.LIMITED,
                       bits=BitEncoding(8, 8, 0)))
    target = Target(w=2 * src_w, h=2 * src_h, color=CSP_SRGB, bit_depth=8)
    params = RenderParams(upscaler="ewa_lanczos",
                          peak_detect=PeakDetectParams(percentile=99.5))
    # pin both sides to the phased scaler: the test compares tail
    # LAYOUTS, and the (bit-exact) direct-EWA default still reorders
    # the peak-reduction tiling enough to flip knife-edge dither pixels
    monkeypatch.setenv("LPTPU_DIRECT_EWA", "0")
    ref = np.asarray(Renderer()._render_once(frame, target, params))
    monkeypatch.setenv("LPTPU_PHASED_TAIL", "1")
    out = np.asarray(Renderer()._render_once(frame, target, params))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def _hdr_yuv(h=32, w=48, seed=0):
    rng = np.random.default_rng(seed)
    y = (rng.random((h, w)) * 219 + 16).astype(np.uint8)
    u = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    v = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    return frame_from_yuv420p(
        y, u, v, color=CSP_BT2100_PQ,
        repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                       levels=ColorLevels.LIMITED,
                       bits=BitEncoding(8, 8, 0)))


def test_inverse_tone_mapping():
    """SDR -> HDR expansion (reference pl_color_map_params
    .inverse_tone_mapping, colorspace.c:1674): disabled, the output
    never exceeds the source peak; enabled, bright content stretches
    toward the display peak."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, ColorSpace,
                                                ColorTransfer, HdrMetadata)
    f = _rgb_frame(32, 48, seed=5)
    hdr_tgt = Target(w=48, h=32, color=ColorSpace(
        ColorPrimaries.BT_709, ColorTransfer.PQ,
        hdr=HdrMetadata(max_luma=1000.0)))
    out_off = np.asarray(Renderer().render(f, hdr_tgt, _params()))
    out_on = np.asarray(Renderer().render(
        f, hdr_tgt, _params(inverse_tone_mapping=True)))
    assert np.all(np.isfinite(out_on))
    # expansion raises the brightest pixels' encoded values
    assert out_on.max() > out_off.max() + 1e-3
    # and stays monotone: dark pixels stay dark
    assert out_on.min() >= -1e-6


def test_gamut_expansion_flag():
    """Narrow -> wide perceptual mapping only expands with
    gamut_expansion=True (reference colorspace.c:1709 clips the output
    gamut to the source otherwise)."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, ColorSpace,
                                                ColorTransfer)
    f = _rgb_frame(32, 48, seed=6)
    wide = Target(w=48, h=32, color=ColorSpace(
        ColorPrimaries.BT_2020, ColorTransfer.SRGB))
    out_off = np.asarray(Renderer().render(f, wide, _params()))
    out_on = np.asarray(Renderer().render(
        f, wide, _params(gamut_expansion=True)))
    assert np.all(np.isfinite(out_off)) and np.all(np.isfinite(out_on))
    # expansion changes saturated pixels (boundary stretch)
    assert np.abs(out_on - out_off).max() > 1e-4


def test_primaries_clip_subset_identity():
    """Clipping a gamut against a superset returns it unchanged; against
    a subset it shrinks toward the subset."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                primaries_clip,
                                                primaries_compatible,
                                                primaries_get,
                                                primaries_superset)
    p709 = primaries_get(ColorPrimaries.BT_709)
    p2020 = primaries_get(ColorPrimaries.BT_2020)
    assert primaries_compatible(p709, p2020)
    clipped = primaries_clip(p709, p2020)   # 709 inside 2020 -> identity
    for a, b in ((clipped.red, p709.red), (clipped.green, p709.green),
                 (clipped.blue, p709.blue)):
        assert abs(a.x - b.x) < 1e-6 and abs(a.y - b.y) < 1e-6
    shrunk = primaries_clip(p2020, p709)    # 2020 clipped into 709-ish
    assert primaries_superset(p2020, shrunk)
    assert abs(shrunk.red.x - p2020.red.x) > 1e-3 or \
        abs(shrunk.green.y - p2020.green.y) > 1e-3


def test_show_clipping_highlights():
    """show_clipping recolors out-of-range pixels (reference
    colorspace.c:1997-2010) and leaves in-range content alone."""
    f = _hdr_yuv(32, 48, seed=7)
    tgt = Target(w=48, h=32, color=CSP_SRGB)
    p_off = _params()
    p_on = _params(show_clipping=True)
    out_off = np.asarray(Renderer().render(f, tgt, p_off))
    out_on = np.asarray(Renderer().render(f, tgt, p_on))
    assert np.all(np.isfinite(out_on))
    # random HDR noise at 10k-nit metadata: most pixels in range ->
    # unchanged; output shape preserved
    assert out_on.shape == out_off.shape


def test_contrast_smoothness_changes_feature_map():
    """contrast_smoothness scales the recovery feature map (reference
    renderer.c:2112); different ratios give different detail injection."""
    f = _hdr_yuv(32, 48, seed=8)
    tgt = Target(w=96, h=64, color=CSP_SRGB)
    a = np.asarray(Renderer().render(
        f, tgt, _params(contrast_recovery=0.6, contrast_smoothness=2.0)))
    b = np.asarray(Renderer().render(
        f, tgt, _params(contrast_recovery=0.6, contrast_smoothness=8.0)))
    assert np.abs(a - b).max() > 1e-5
    # smoothness <= 1 disables recovery entirely
    c = np.asarray(Renderer().render(
        f, tgt, _params(contrast_recovery=0.6, contrast_smoothness=1.0)))
    d = np.asarray(Renderer().render(f, tgt, _params()))
    np.testing.assert_allclose(c, d, atol=1e-6)


def test_border_blur_and_skip():
    """border="blur" fills the letterbox with a blurred cover of the
    image (reference PL_CLEAR_BLUR, renderer.c:2510); "skip" leaves
    transparent black."""
    f = _rgb_frame(32, 48, seed=9)
    tgt = Target(w=96, h=96, color=CSP_SRGB,
                 crop=RectF(0, 16, 96, 80))    # letterbox bars
    out_blur = np.asarray(Renderer().render(
        f, tgt, _params(border="blur", blur_radius=8.0)))
    # bars are a blurred copy: non-black, low-variance vs the image rows
    top = out_blur[:, :16, :]
    assert top.mean() > 1e-3
    mid = out_blur[:, 16:80, :]
    assert top.std() < mid.std()
    out_skip = np.asarray(Renderer().render(
        f, tgt, _params(border="skip")))
    np.testing.assert_allclose(out_skip[:, :16, :], 0.0, atol=1e-7)
    # skip_target_clearing is the legacy alias
    out_legacy = np.asarray(Renderer().render(
        f, tgt, _params(skip_target_clearing=True)))
    np.testing.assert_allclose(out_legacy[:, :16, :], 0.0, atol=1e-7)


def test_force_dither_16bit():
    """16-bit outputs skip dithering unless force_dither (reference
    renderer.c:2888)."""
    from libplacebo_tpu.ops.dithering import DitherParams
    f = _rgb_frame(16, 128, seed=10)
    tgt = Target(w=128, h=16, color=CSP_SRGB, bit_depth=16)
    base = np.asarray(Renderer().render(
        f, tgt, _params(dither=DitherParams())))
    forced = np.asarray(Renderer().render(
        f, tgt, _params(dither=DitherParams(), force_dither=True)))
    # undithered 16-bit returns the continuous signal
    undithered = np.asarray(Renderer().render(f, tgt, _params()))
    np.testing.assert_allclose(base, undithered, atol=1e-7)
    # forced: quantized to 16-bit steps
    scale = (1 << 16) - 1
    assert np.abs(np.round(forced * scale) - forced * scale).max() < 1e-2


def test_distortion_rotation_roundtrip():
    """pl_shader_distort analog (sampling.c:1108): a 90-degree affine
    rotation of a square image matches np.rot90; identity is a no-op."""
    from libplacebo_tpu.ops.distort import DistortParams, distort_image
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
    ident = distort_image(img, 32, 32, DistortParams())
    np.testing.assert_allclose(np.asarray(ident), np.asarray(img),
                               atol=1e-5)
    rot = distort_image(img, 32, 32,
                        DistortParams.rotation(np.pi / 2))
    expect = np.rot90(np.asarray(img), k=1, axes=(-2, -1))
    # interior matches (edges see address-mode clamping)
    np.testing.assert_allclose(np.asarray(rot)[:, 2:-2, 2:-2],
                               expect[:, 2:-2, 2:-2], atol=1e-4)


def test_distortion_in_renderer_with_alpha():
    """params.distort runs in the output stage; alpha_mode marks
    out-of-bounds areas transparent (reference renderer.c:2655)."""
    from libplacebo_tpu.ops.distort import DistortParams
    f = _rgb_frame(32, 32, seed=12)
    tgt = Target(w=32, h=32, color=CSP_SRGB)
    p = _params(distort=DistortParams(
        transform=((0.5, 0.0), (0.0, 0.5)),
        alpha_mode="independent"))
    out = np.asarray(Renderer().render(f, tgt, p))
    assert out.shape[0] == 4                     # alpha appended
    assert out[3].min() < 0.5 and out[3].max() > 0.5   # OOB + interior
    # scaled-down content sits centered; corners are out of bounds
    assert out[3, 0, 0] < 0.5 and out[3, 16, 16] > 0.5


def test_target_blend_alpha_overlay():
    """RenderParams.blend + Target.data: the rendered image composites
    over existing contents with pl_alpha_overlay factors (gpu.h:1163)."""
    from libplacebo_tpu.render.renderer import ALPHA_OVERLAY
    rng = np.random.default_rng(13)
    base = rng.random((3, 32, 48)).astype(np.float32)
    # a frame with constant alpha 0.25 via distort alpha? simpler: use
    # an RGBA frame
    rgba = rng.random((32, 48, 4)).astype(np.float32)
    rgba[..., 3] = 0.25
    from libplacebo_tpu.render.frame import frame_from_rgb
    f = frame_from_rgb(rgba, color=CSP_SRGB)
    tgt = Target(w=48, h=32, color=CSP_SRGB, data=base)
    out = np.asarray(Renderer().render(
        f, tgt, _params(blend=ALPHA_OVERLAY)))
    src = np.asarray(Renderer().render(
        f, Target(w=48, h=32, color=CSP_SRGB), _params()))[:3]
    expect = src * 0.25 + base * 0.75
    np.testing.assert_allclose(out[:3], expect, atol=2e-2)


def test_visualize_tone_map_overlay():
    """visualize_lut draws the tone curve into visualize_rect
    (reference colorspace.c:1424): the rect region differs from a
    non-visualized render, the rest matches."""
    f = _hdr_yuv(32, 64, seed=14)
    tgt = Target(w=64, h=32, color=CSP_SRGB)
    plain = np.asarray(Renderer().render(f, tgt, _params()))
    viz = np.asarray(Renderer().render(f, tgt, _params(
        visualize_lut=True, visualize_rect=(0.0, 0.0, 0.5, 0.5))))
    assert np.all(np.isfinite(viz))
    # the rect is in image coordinates (top-down): y [0, 0.5] covers
    # the TOP half, x [0, 0.5] the left half; the curve renders y-up
    # within it
    changed = np.abs(viz - plain).max(axis=0) > 1e-6
    assert changed[:16, :32].any()          # top-left painted
    assert not changed[16:, :].any()        # bottom untouched
    assert not changed[:16, 32:].any()      # top-right untouched


def test_st2094_dynamic_peak_detection():
    """st2094-40/-10 now run with traced detected-peak stats (reference
    regenerates the LUT from the detected peak for any function): the
    peak state must advance, and output must react to content peak."""
    from libplacebo_tpu.ops.peak_detect import PeakDetectParams
    rng = np.random.default_rng(5)
    y = (rng.random((48, 64)) * 219 + 16).astype(np.uint8)
    u = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    v = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    f = frame_from_yuv420p(y, u, v, color=CSP_BT2100_PQ,
                           repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                                          levels=ColorLevels.LIMITED,
                                          bits=BitEncoding(8, 8, 0)))
    tgt = Target(w=64, h=48, color=CSP_SRGB)
    for fn in ("st2094-40", "st2094-10"):
        r = Renderer()
        params = _params(tone_mapping_function=fn,
                         peak_detect=PeakDetectParams(
                             percentile=99.5, allow_delayed=False))
        out = np.asarray(r.render(f, tgt, params))
        assert np.all(np.isfinite(out)), fn
        state = np.asarray(r._peak_state)
        assert state.any(), (fn, state)   # detection actually ran


def test_st2094_40_honors_hdr10plus_ootf():
    """HDR10+ OOTF bezier anchors change the static st2094-40 curve
    (previously the metadata never reached ToneMapParams)."""
    from dataclasses import replace as dc_replace
    from libplacebo_tpu.core.colorspace import HdrBezier
    rng = np.random.default_rng(6)
    y = (rng.random((48, 64)) * 219 + 16).astype(np.uint8)
    u = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    v = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)

    def make(ootf):
        color = CSP_BT2100_PQ
        if ootf is not None:
            color = dc_replace(
                color, hdr=dc_replace(color.hdr, ootf=ootf))
        return frame_from_yuv420p(
            y, u, v, color=color,
            repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                           levels=ColorLevels.LIMITED,
                           bits=BitEncoding(8, 8, 0)))

    tgt = Target(w=64, h=48, color=CSP_SRGB)
    params = _params(tone_mapping_function="st2094-40", peak_detect=None)
    out_plain = np.asarray(Renderer().render(make(None), tgt, params))
    bez = HdrBezier(target_luma=500.0, knee_x=0.3, knee_y=0.25,
                    anchors=(0.2, 0.5, 0.8))
    out_bez = np.asarray(Renderer().render(make(bez), tgt, params))
    assert np.all(np.isfinite(out_bez))
    assert not np.array_equal(out_plain, out_bez)


# ---------------------------------------------------------------------------
# Round-2 API parity batch: frames_infer, clear helpers, hdr metadata,
# renderer save/load, frame-mix pick helpers, options hook management
# ---------------------------------------------------------------------------

def test_frames_infer():
    from libplacebo_tpu.render.renderer import frames_infer
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                ColorTransfer)
    f = _rgb_frame(8, 8)
    f.color = CSP_BT2100_PQ
    tgt = Target(w=16, h=16)    # fully unknown target colorspace
    f2, t2 = frames_infer(f, tgt)
    # wide-gamut HDR source -> BT.709 / BT.1886 target defaults
    assert t2.color.primaries == ColorPrimaries.BT_709
    assert t2.color.transfer == ColorTransfer.BT_1886
    assert f2.color.hdr.max_luma == 10000.0
    assert t2.color.hdr.max_luma > 0
    # pixel data untouched
    assert f2.planes[0].data is f.planes[0].data


def test_frames_infer_mix():
    from libplacebo_tpu.render.renderer import frames_infer_mix
    from libplacebo_tpu.render.queue import FrameMix
    a, b = _rgb_frame(8, 8, seed=1), _rgb_frame(8, 8, seed=2)
    mix = FrameMix(frames=[a, b], timestamps=[-0.2, 0.8])
    tgt = Target(w=16, h=16)
    t2, ref2 = frames_infer_mix(mix, tgt)
    assert ref2 is not None and t2.color.primaries != 0
    # empty mix still infers the target standalone
    t3, ref3 = frames_infer_mix(FrameMix(), tgt)
    assert ref3 is None and t3.color.hdr.max_luma > 0


def test_clear_target_rgba():
    from libplacebo_tpu.render.renderer import clear_target
    tgt = Target(w=8, h=4, color=CSP_SRGB)
    out = np.asarray(clear_target(tgt, (1.0, 0.0, 0.0, 1.0)))
    assert out.shape[1:] == (4, 8)
    # red fill stays red in an sRGB target
    np.testing.assert_allclose(out[0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-5)
    # mid-gray in a PQ target encodes to the PQ code of 0.5^2.2*203 nits
    tgt_pq = Target(w=2, h=2, color=CSP_BT2100_PQ)
    out_pq = np.asarray(clear_target(tgt_pq, (0.5, 0.5, 0.5, 1.0)))
    assert 0.4 < out_pq[0, 0, 0] < 0.6      # ~0.51 PQ
    # YCbCr target: gray encodes with centered chroma
    from libplacebo_tpu.core.colorspace import BitEncoding
    tgt_yuv = Target(w=2, h=2, color=CSP_SRGB,
                     repr=ColorRepr(sys=ColorSystem.BT_709,
                                    levels=ColorLevels.LIMITED,
                                    bits=BitEncoding(8, 8, 0)))
    out_yuv = np.asarray(clear_target(tgt_yuv, (0.5, 0.5, 0.5, 1.0)))
    assert abs(out_yuv[1, 0, 0] - 128 / 255) < 1e-3
    assert abs(out_yuv[2, 0, 0] - 128 / 255) < 1e-3


def test_clear_target_tiles():
    from libplacebo_tpu.render.renderer import clear_target_tiles
    tgt = Target(w=64, h=64, color=CSP_SRGB)
    out = np.asarray(clear_target_tiles(tgt, tile_size=16))
    assert out.shape == (3, 64, 64)
    # checkerboard: two distinct values, alternating at tile boundaries
    assert abs(out[0, 0, 0] - out[0, 0, 16]) > 1e-3
    assert abs(out[0, 0, 0] - out[0, 16, 16]) < 1e-6


def test_get_hdr_metadata():
    from libplacebo_tpu.ops.peak_detect import PeakDetectParams
    rng = np.random.default_rng(0)
    y = (rng.random((32, 32)) * 219 + 16).astype(np.uint8)
    u = (rng.random((16, 16)) * 224 + 16).astype(np.uint8)
    v = (rng.random((16, 16)) * 224 + 16).astype(np.uint8)
    f = frame_from_yuv420p(y, u, v, color=CSP_BT2100_PQ,
                           repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                                          levels=ColorLevels.LIMITED,
                                          bits=BitEncoding(8, 8, 0)))
    r = Renderer()
    assert r.get_hdr_metadata() is None
    r.render(f, Target(w=32, h=32, color=CSP_SRGB),
             _params(peak_detect=PeakDetectParams()))
    md = r.get_hdr_metadata()
    assert md is not None and 0 < md.max_pq_y <= 1.0
    assert 0 < md.avg_pq_y <= md.max_pq_y
    r.reset_peak_detection()
    assert r.get_hdr_metadata() is None


def test_renderer_save_load():
    from libplacebo_tpu import runtime
    ctx = runtime.create_dummy()
    ctx.cache.set(1234, b"artifact")
    r = Renderer(ctx=ctx)
    blob = r.save()
    assert blob
    ctx2 = runtime.create_dummy()
    r2 = Renderer(ctx=ctx2)
    assert r2.load(blob) == 1
    assert ctx2.cache.get(1234) == b"artifact"
    # renderer without a context degrades to an empty blob
    assert Renderer().save() == b""


def test_frame_mix_pick_helpers():
    from libplacebo_tpu.render.queue import (FrameMix, frame_mix_current,
                                             frame_mix_nearest,
                                             frame_mix_radius)
    a, b, c = (_rgb_frame(4, 4, seed=s) for s in (1, 2, 3))
    mix = FrameMix(frames=[a, b, c], timestamps=[-0.9, -0.1, 0.6])
    assert frame_mix_current(mix) is b      # last ts <= 0
    assert frame_mix_nearest(mix) is b      # |−0.1| smallest
    mix2 = FrameMix(frames=[a, b], timestamps=[0.2, 1.2])
    assert frame_mix_current(mix2) is None  # nothing at/before pts
    assert frame_mix_nearest(mix2) is a
    assert frame_mix_current(FrameMix()) is None
    assert frame_mix_nearest(FrameMix()) is None
    # radius: kernel mixers report their footprint, oversample is 0
    assert frame_mix_radius(_params(frame_mixer="oversample")) == 0.0
    assert frame_mix_radius(_params(frame_mixer="none")) == 0.0
    assert frame_mix_radius(_params(frame_mixer="mitchell")) == 2.0


def test_options_hook_management():
    from libplacebo_tpu.core.options import Options, OptionError
    hook_text = ("//!HOOK LUMA\n//!BIND HOOKED\n"
                 "vec4 hook() { return 2.0 * HOOKED_texOff(vec2(0.0)); }\n")
    o = Options()
    o.add_hook(hook_text)
    assert len(o.params.hooks) == 1
    o.insert_hook(0, hook_text)
    assert len(o.params.hooks) == 2
    o.remove_hook_at(1)
    assert len(o.params.hooks) == 1
    with pytest.raises(OptionError):
        o.add_hook("//!not a shader at all\x00")
    with pytest.raises(IndexError):
        o.remove_hook_at(5)


def test_plane_downscaler_and_inherit():
    """Reference renderer.c:632-645: plane scalers are direction-aware
    and None inherits the main scalers."""
    from libplacebo_tpu.core.colorspace import (ColorLevels, ColorRepr,
                                                ColorSystem)
    from libplacebo_tpu.render.frame import Frame, Plane
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    # luma 16x16 ref plane + chroma sampled at 32x32 (supersampled):
    # merging requires a 2x DOWNSCALE of chroma
    y = jnp.asarray(rng.random((1, 16, 16), np.float32))
    u = jnp.asarray(rng.random((1, 32, 32), np.float32))
    v = jnp.asarray(rng.random((1, 32, 32), np.float32))
    f = Frame(planes=[Plane(y, (0,)), Plane(u, (1,)), Plane(v, (2,))],
              repr=ColorRepr(sys=ColorSystem.BT_709,
                             levels=ColorLevels.FULL),
              color=CSP_SRGB)
    tgt = Target(w=16, h=16, color=CSP_SRGB)
    out_box = np.asarray(Renderer().render(
        f, tgt, _params(plane_downscaler="box")))
    out_cat = np.asarray(Renderer().render(
        f, tgt, _params(plane_downscaler="catmull_rom")))
    # different downscalers actually change the merged chroma
    assert np.abs(out_box - out_cat).max() > 1e-4
    # plane_downscaler=None inherits the main downscaler
    out_inherit = np.asarray(Renderer().render(
        f, tgt, _params(plane_downscaler=None, downscaler="box")))
    np.testing.assert_allclose(out_inherit, out_box, atol=1e-6)
    # plane_upscaler=None inherits the main upscaler (chroma 8x8 up)
    u8 = jnp.asarray(rng.random((1, 8, 8), np.float32))
    f2 = Frame(planes=[Plane(y, (0,)), Plane(u8, (1,)), Plane(u8, (2,))],
               repr=ColorRepr(sys=ColorSystem.BT_709,
                              levels=ColorLevels.FULL),
               color=CSP_SRGB)
    out_a = np.asarray(Renderer().render(
        f2, tgt, _params(plane_upscaler=None, upscaler="mitchell")))
    out_b = np.asarray(Renderer().render(
        f2, tgt, _params(plane_upscaler="mitchell")))
    np.testing.assert_allclose(out_a, out_b, atol=1e-6)


def test_correct_subpixel_offsets():
    """Reference renderer.h:322: same-size planes with a pure subpixel
    siting offset snap by default; the flag forces resampling."""
    from libplacebo_tpu.core.colorspace import (ColorLevels, ColorRepr,
                                                ColorSystem)
    from libplacebo_tpu.render.frame import Frame, Plane
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.random((1, 16, 16), np.float32))
    c = jnp.asarray(rng.random((1, 16, 16), np.float32))
    f = Frame(planes=[Plane(y, (0,)),
                      Plane(c, (1,), shift_x=-0.5),
                      Plane(c, (2,), shift_x=-0.5)],
              repr=ColorRepr(sys=ColorSystem.BT_709,
                             levels=ColorLevels.FULL),
              color=CSP_SRGB)
    tgt = Target(w=16, h=16, color=CSP_SRGB)
    out_snap = np.asarray(Renderer().render(f, tgt, _params()))
    out_fix = np.asarray(Renderer().render(
        f, tgt, _params(correct_subpixel_offsets=True)))
    # snapped output keeps the plane's own samples; corrected resamples
    assert np.abs(out_snap - out_fix).max() > 1e-4


# ---------------------------------------------------------------------------
# Full pl_overlay contract: parts, modes, coords, color conversion
# (reference draw_overlays, renderer.c:811-1025)
# ---------------------------------------------------------------------------

def test_overlay_monochrome_parts():
    """Monochrome overlays: the texture is an alpha map; each part's
    color paints it (the libass bitmap contract, renderer.h:258)."""
    from libplacebo_tpu.render.frame import OverlayPart
    f = _rgb_frame(32, 32, seed=4)
    mask = np.zeros((1, 8, 8), np.float32)
    mask[0, :4] = 1.0          # top half opaque, bottom transparent
    f.overlays = [Overlay(
        data=jnp.asarray(mask), mode="monochrome", coords="dst_frame",
        parts=(OverlayPart(src=RectF(0, 0, 8, 8), dst=RectF(4, 4, 12, 12),
                           color=(0.0, 0.0, 1.0, 1.0)),
               OverlayPart(src=RectF(0, 0, 8, 8), dst=RectF(20, 4, 28, 12),
                           color=(1.0, 1.0, 0.0, 0.5))))]
    out = np.asarray(Renderer().render(
        f, Target(w=32, h=32, color=CSP_SRGB), _params()))
    src = np.asarray(f.planes[0].data)
    # part 1: opaque blue where the mask is set
    np.testing.assert_allclose(out[:, 5, 8], [0, 0, 1], atol=1e-5)
    # part 1 below the mask: untouched
    np.testing.assert_allclose(out[:, 10, 8], src[:, 10, 8], atol=2e-2)
    # part 2: half-transparent yellow
    expect = 0.5 * np.array([1, 1, 0]) + 0.5 * src[:, 5, 24]
    np.testing.assert_allclose(out[:, 5, 24], expect, atol=2e-2)


def test_overlay_parts_src_region():
    """part.src selects a sub-region of the overlay texture."""
    from libplacebo_tpu.render.frame import OverlayPart
    f = _rgb_frame(16, 16, seed=5)
    tex = np.zeros((4, 4, 8), np.float32)
    tex[0, :, :4] = 1.0        # left half red
    tex[1, :, 4:] = 1.0        # right half green
    tex[3] = 1.0
    f.overlays = [Overlay(
        data=jnp.asarray(tex), coords="dst_frame",
        parts=(OverlayPart(src=RectF(4, 0, 8, 4), dst=RectF(0, 0, 4, 4)),))]
    out = np.asarray(Renderer().render(
        f, Target(w=16, h=16, color=CSP_SRGB), _params()))
    np.testing.assert_allclose(out[:, 1, 1], [0, 1, 0], atol=1e-5)


def test_overlay_coords_src_frame_scales():
    """src_frame overlays ride the src->dst scale (renderer.c:832-846):
    with a 2x upscale, a part at src (4..8) lands at dst (8..16)."""
    from libplacebo_tpu.render.frame import OverlayPart
    f = _rgb_frame(16, 16, seed=6)
    tex = np.zeros((4, 4, 4), np.float32)
    tex[2] = 1.0               # blue
    tex[3] = 1.0
    f.overlays = [Overlay(
        data=jnp.asarray(tex), coords="src_frame",
        parts=(OverlayPart(src=RectF(0, 0, 4, 4), dst=RectF(4, 4, 8, 8)),))]
    out = np.asarray(Renderer().render(
        f, Target(w=32, h=32, color=CSP_SRGB), _params()))
    np.testing.assert_allclose(out[:, 12, 12], [0, 0, 1], atol=1e-5)
    # outside the scaled part: matches a render without the overlay
    np.testing.assert_allclose(out[:, 20, 20],
                               np.asarray(Renderer().render(
                                   _rgb_frame(16, 16, seed=6),
                                   Target(w=32, h=32, color=CSP_SRGB),
                                   _params()))[:, 20, 20], atol=1e-6)


def test_overlay_on_target():
    """Target overlays (OSD on the output) default to DST_FRAME coords
    (renderer.c:861)."""
    f = _rgb_frame(16, 16, seed=7)
    tex = np.zeros((4, 4, 4), np.float32)
    tex[0] = 1.0
    tex[3] = 1.0
    tgt = Target(w=32, h=32, color=CSP_SRGB,
                 overlays=(Overlay(data=jnp.asarray(tex),
                                   rect=RectF(28, 28, 32, 32)),))
    out = np.asarray(Renderer().render(f, tgt, _params()))
    np.testing.assert_allclose(out[:, 30, 30], [1, 0, 0], atol=1e-5)


def test_overlay_clipped_at_canvas_edge():
    """Parts extending past the target are clipped, not wrapped."""
    f = _rgb_frame(16, 16, seed=8)
    tex = np.zeros((4, 4, 4), np.float32)
    tex[1] = 1.0
    tex[3] = 1.0
    f.overlays = [Overlay(data=jnp.asarray(tex), rect=RectF(14, 14, 22, 22))]
    out = np.asarray(Renderer().render(
        f, Target(w=16, h=16, color=CSP_SRGB), _params()))
    assert out.shape == (3, 16, 16)
    np.testing.assert_allclose(out[:, 15, 15], [0, 1, 0], atol=1e-5)


def test_overlay_color_conversion():
    """An overlay carrying its own encoding (limited-range, BT.1886) is
    decoded and converted to the target encoding (renderer.c:962-991):
    limited-range white (235/255) must land at full-range 1.0."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                ColorSpace, ColorTransfer)
    f = _rgb_frame(16, 16, seed=9)
    tex = np.full((4, 4, 4), 235.0 / 255.0, np.float32)
    tex[3] = 1.0
    f.overlays = [Overlay(
        data=jnp.asarray(tex), rect=RectF(0, 0, 4, 4),
        repr=ColorRepr(sys=ColorSystem.RGB, levels=ColorLevels.LIMITED),
        color=ColorSpace(ColorPrimaries.BT_709, ColorTransfer.BT_1886))]
    out = np.asarray(Renderer().render(
        f, Target(w=16, h=16, color=CSP_SRGB), _params()))
    np.testing.assert_allclose(out[:, 2, 2], [1, 1, 1], atol=5e-3)


def test_overlay_premultiplied_alpha():
    """Premultiplied overlays blend with src_rgb factor ONE
    (renderer.c:996-1001)."""
    from libplacebo_tpu.core.colorspace import AlphaMode
    f = _rgb_frame(16, 16, seed=10)
    tex = np.zeros((4, 4, 4), np.float32)
    tex[0] = 0.5               # premultiplied red at alpha 0.5
    tex[3] = 0.5
    f.overlays = [Overlay(
        data=jnp.asarray(tex), rect=RectF(0, 0, 4, 4),
        repr=ColorRepr(alpha=AlphaMode.PREMULTIPLIED))]
    out = np.asarray(Renderer().render(
        f, Target(w=16, h=16, color=CSP_SRGB), _params()))
    src = np.asarray(f.planes[0].data)
    np.testing.assert_allclose(out[0, 2, 2], 0.5 + 0.5 * src[0, 2, 2],
                               atol=2e-2)
    np.testing.assert_allclose(out[1, 2, 2], 0.5 * src[1, 2, 2], atol=2e-2)


def test_overlay_src_frame_rotates_alongside():
    """SRC_FRAME overlays rotate with the image (renderer.h coords
    note): under rot90 a part at the frame's top-left lands where the
    top-left content lands."""
    from libplacebo_tpu.render.frame import OverlayPart
    f = _rgb_frame(16, 16, seed=11)
    f.rotation = Rotation(1)
    f.crop = RectF(0, 0, 16, 16)
    tex = np.zeros((4, 4, 4), np.float32)
    tex[0] = 1.0
    tex[3] = 1.0
    f.overlays = [Overlay(
        data=jnp.asarray(tex), coords="src_frame",
        parts=(OverlayPart(src=RectF(0, 0, 4, 4), dst=RectF(0, 0, 4, 4)),))]
    out = np.asarray(Renderer().render(
        f, Target(w=16, h=16, color=CSP_SRGB), _params()))
    # rot90 CCW sends src (0..4, 0..4) to (y: 12..16, x: 0..4)
    np.testing.assert_allclose(out[:, 14, 2], [1, 0, 0], atol=1e-5)


def test_random_option_combos_render():
    """Robustness net: random combinations of REAL options (sampled
    from the reflection table, seeded) must render a small frame
    without raising — the render-with-combos analog of the
    options-parse fuzz (reference fuzz/options.c only parses)."""
    import random
    from libplacebo_tpu.core.options import OPTION_TABLE, Options
    rnd = random.Random(1234)
    table = [o for o in OPTION_TABLE()
             # error_diffusion compiles a Pallas kernel per shape (slow
             # cold); hooks need shader text
             if o.key not in ("error_diffusion", "preset")]
    f = _rgb_frame(24, 32, seed=12)
    tgt = Target(w=48, h=64, color=CSP_SRGB, bit_depth=8)
    for trial in range(12):
        opts = Options()
        for o in rnd.sample(table, 6):
            if o.type == "bool":
                val = rnd.choice(["yes", "no"])
            elif o.type in ("int", "float"):
                lo, hi = o.minimum, o.maximum or (o.minimum + 1.0)
                v = lo + (hi - lo) * rnd.random()
                val = str(int(v)) if o.type == "int" else f"{v:.4g}"
            elif o.choices:
                val = rnd.choice(list(o.choices))
            else:
                continue
            try:
                opts.set(o.key, val)
            except Exception:
                continue    # per-option validation may reject; fine
        out = np.asarray(Renderer().render(f, tgt, opts.params))
        assert out.shape[-2:] == (64, 48), (trial, opts.save())
        assert np.isfinite(out).all(), (trial, opts.save())


def test_temporal_dither_rotates_per_frame():
    """dither.temporal rotates the pattern every frame (reference
    pl_dither_params.temporal + pl_dispatch_reset_frame's temporal
    index): consecutive frames of identical content dither differently,
    and the cycle repeats after 8 frames."""
    from libplacebo_tpu.ops.dithering import DitherParams
    f = _rgb_frame(16, 16, seed=13)
    tgt = Target(w=16, h=16, color=CSP_SRGB, bit_depth=4)
    p = _params(dither=DitherParams(temporal=True))
    r = Renderer()
    outs = [np.asarray(r.render(f, tgt, p)) for _ in range(9)]
    assert not np.array_equal(outs[0], outs[1])   # pattern rotated
    np.testing.assert_array_equal(outs[0], outs[8])  # 8-phase cycle
    # without temporal: bit-identical frames
    r2 = Renderer()
    p2 = _params(dither=DitherParams(temporal=False))
    a = np.asarray(r2.render(f, tgt, p2))
    b = np.asarray(r2.render(f, tgt, p2))
    np.testing.assert_array_equal(a, b)


def test_overlay_invalid_mode_coords_raise():
    """Unknown overlay mode/coords are user errors: they raise rather
    than silently rendering something else (the honest-degradation
    contract covers backend failures only)."""
    f = _rgb_frame(8, 8)
    tex = jnp.asarray(np.ones((4, 2, 2), np.float32))
    f.overlays = [Overlay(data=tex, rect=RectF(0, 0, 2, 2), mode="bogus")]
    with pytest.raises(ValueError, match="overlay mode"):
        Renderer().render(f, Target(w=8, h=8, color=CSP_SRGB), _params())
    f.overlays = [Overlay(data=tex, rect=RectF(0, 0, 2, 2),
                          coords="sideways")]
    with pytest.raises(ValueError, match="overlay coords"):
        Renderer().render(f, Target(w=8, h=8, color=CSP_SRGB), _params())


def test_frame_acquire_release():
    """Reference pl_frame.acquire/release (renderer.h:565-569): acquire
    runs before plane use (and may fill planes), release always runs —
    including after failures and refusals."""
    from libplacebo_tpu.render.renderer import RenderError
    calls = []
    f = _rgb_frame(8, 8, seed=20)
    f.acquire = lambda fr: calls.append("acq") or True
    f.release = lambda fr: calls.append("rel")
    out = Renderer().render(f, Target(w=8, h=8, color=CSP_SRGB), _params())
    assert calls == ["acq", "rel"] and np.isfinite(np.asarray(out)).all()

    # refusal: RenderError raised, release still called
    calls.clear()
    f.acquire = lambda fr: False
    with pytest.raises(RenderError, match="acquire"):
        Renderer().render(f, Target(w=8, h=8, color=CSP_SRGB), _params())
    assert calls == ["rel"]

    # interlaced: prev/next acquired alongside (renderer.h:563)
    calls.clear()
    f.acquire = lambda fr: calls.append("acq") or True
    prev = _rgb_frame(8, 8, seed=21)
    prev.acquire = lambda fr: calls.append("acq_prev") or True
    prev.release = lambda fr: calls.append("rel_prev")
    f.prev = prev
    from libplacebo_tpu.ops.deinterlace import (DeinterlaceAlgo,
                                                DeinterlaceParams, Field)
    f.field = Field.TOP
    Renderer().render(f, Target(w=8, h=8, color=CSP_SRGB),
                      _params(deinterlace=DeinterlaceParams(
                          DeinterlaceAlgo.YADIF)))
    assert "acq" in calls and "acq_prev" in calls and \
        "rel" in calls and "rel_prev" in calls
