"""Renderer end-to-end tests — mirrors pl_render_tests
(src/tests/gpu_tests.c:1155)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                            ColorRepr, ColorSpace,
                                            ColorSystem, CSP_BT2100_PQ,
                                            CSP_SRGB)
from libplacebo_tpu.core.common import RectF
from libplacebo_tpu.render.frame import (Frame, Plane, frame_from_rgb,
                                         frame_from_yuv420p)
from libplacebo_tpu.render.renderer import (DEFAULT_PARAMS, FAST_PARAMS,
                                            HIGH_QUALITY_PARAMS,
                                            RenderParams, Renderer, Target)


def _yuv_frame(h=72, w=96, seed=0, **kw):
    rng = np.random.default_rng(seed)
    y = (rng.random((h, w)) * 219 + 16).astype(np.uint8)
    u = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    v = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    return frame_from_yuv420p(y, u, v, **kw)


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64))**2)
    return 10 * np.log10(1.0 / max(mse, 1e-12))


def test_basic_render():
    r = Renderer()
    frame = _yuv_frame()
    out = r.render(frame, Target(w=192, h=144))
    assert out.shape == (3, 144, 192)
    o = np.asarray(out)
    assert o.min() >= 0 and o.max() <= 1
    assert np.all(np.isfinite(o))


@pytest.mark.parametrize("params", [FAST_PARAMS, DEFAULT_PARAMS,
                                    HIGH_QUALITY_PARAMS],
                         ids=["fast", "default", "hq"])
def test_presets(params):
    r = Renderer()
    out = r.render(_yuv_frame(), Target(w=128, h=96, bit_depth=8), params)
    assert out.shape == (3, 96, 128)
    assert np.all(np.isfinite(np.asarray(out)))


def test_render_cache_hit():
    r = Renderer()
    frame = _yuv_frame()
    tgt = Target(w=100, h=80)
    r.render(frame, tgt)
    n = len(r._cache)
    r.render(_yuv_frame(seed=9), tgt)   # same geometry, new data
    assert len(r._cache) == n           # no recompile


def test_gray_world_preserved():
    """A mid-gray YUV frame renders to mid-gray RGB (roundtrip through
    decode/linearize/scale/delinearize/encode is value-preserving)."""
    h = w = 64
    y = np.full((h, w), 126, np.uint8)          # Y for ~0.5 gray limited
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    frame = frame_from_yuv420p(y, u, v)
    out = np.asarray(Renderer().render(frame, Target(w=2 * w, h=2 * h)))
    expect = (126 - 16) / 219
    np.testing.assert_allclose(out, expect, atol=2e-3)


def test_rgb_passthrough_identity():
    """RGB frame -> same-size RGB target with no color change == identity
    (within float error)."""
    rng = np.random.default_rng(5)
    rgb = rng.random((48, 64, 3)).astype(np.float32)
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    tgt = Target(w=64, h=48, color=CSP_SRGB)
    out = Renderer().render(frame, tgt)
    assert psnr(out, np.moveaxis(rgb, -1, 0)) > 50


def test_hdr_to_sdr():
    frame = _yuv_frame(color=CSP_BT2100_PQ, repr=ColorRepr(
        sys=ColorSystem.BT_2020_NC, levels=ColorLevels.LIMITED,
        bits=BitEncoding(8, 8, 0)))
    out = Renderer().render(frame, Target(w=128, h=96, color=CSP_SRGB))
    o = np.asarray(out)
    assert np.all(np.isfinite(o))
    assert o.max() <= 1.0 + 1e-6


def test_crop():
    rng = np.random.default_rng(6)
    rgb = rng.random((32, 32, 3)).astype(np.float32)
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    frame_cropped = Frame(planes=frame.planes, repr=frame.repr,
                          color=frame.color, crop=RectF(0, 0, 16, 16))
    out_crop = Renderer().render(frame_cropped,
                                 Target(w=32, h=32, color=CSP_SRGB))
    # cropping top-left quadrant then 2x upscale == upscaling the quadrant
    # (away from the crop's interior edges, where the crop correctly reads
    # real texels beyond the rect)
    frame_q = frame_from_rgb(rgb[:16, :16], color=CSP_SRGB)
    out_q = Renderer().render(frame_q, Target(w=32, h=32, color=CSP_SRGB))
    assert psnr(out_crop[:, :26, :26], out_q[:, :26, :26]) > 50


def test_dither_output_levels():
    frame = _yuv_frame()
    out = np.asarray(Renderer().render(
        frame, Target(w=96, h=72, bit_depth=4)))
    # 4-bit output has at most 16 levels per channel
    assert len(np.unique(out)) <= 3 * 16


def test_error_diffusion_render():
    frame = _yuv_frame(h=24, w=32)
    p = RenderParams(error_diffusion="floyd-steinberg")
    out = np.asarray(Renderer().render(
        frame, Target(w=32, h=24, bit_depth=6), p))
    assert np.all(np.isfinite(out))


def test_upscale_psnr_vs_reference_impl():
    """Lanczos3 2x upscale PSNR against an independent float64 oracle
    (direct convolution with the same kernel math)."""
    from libplacebo_tpu.core import filters as flt
    from libplacebo_tpu.ops import sampling as S

    rng = np.random.default_rng(8)
    src = rng.random((1, 24, 24)).astype(np.float32)
    cfg = flt.find_filter_config("lanczos")
    out = np.asarray(S.resize_separable(jnp.asarray(src), 48, 48, cfg))

    # float64 oracle: outer-product weights, direct sum
    idx, w = S.ortho_weights(cfg, 24, 48)
    oracle = np.zeros((1, 48, 24))
    for t in range(idx.shape[1]):
        oracle += src[:, idx[:, t], :] * w[:, t][None, :, None]
    oracle2 = np.zeros((1, 48, 48))
    for t in range(idx.shape[1]):
        oracle2 += oracle[:, :, idx[:, t]] * w[:, t][None, None, :]
    assert psnr(out, oracle2) > 100


def test_chroma_siting_alignment():
    """MPEG-2 left-sited chroma: a chroma impulse at texel c aligns with
    luma column 2c after plane merging (not 2c + 0.5)."""
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem)
    h, w = 16, 32
    y = np.full((h, w), 126, np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    v[:, 8] = 255                        # Cr impulse at chroma column 8
    frame = frame_from_yuv420p(y, u, v)
    out = np.asarray(Renderer().render(
        frame, Target(w=w, h=h), RenderParams(peak_detect=None,
                                              dither=None)))
    # red channel response: peak must be at luma column 16 (= 2*8)
    red = out[0].mean(axis=0)
    assert int(np.argmax(red)) == 16
    # left-sited: column 16 and neighbors symmetric-ish around 16,
    # decidedly not centered between 16 and 17
    assert red[16] > red[17] + 1e-3
    assert abs(red[15] - red[17]) < 0.5 * (red[16] - red[18] + 1e-6) + 0.05


def test_alpha_modes():
    """Premultiplied input is un-multiplied for processing; premultiplied
    target re-multiplies (reference alpha handling)."""
    from libplacebo_tpu.core.colorspace import AlphaMode
    rng = np.random.default_rng(9)
    rgba = rng.random((16, 16, 4)).astype(np.float32) * 0.8 + 0.1
    rgba[..., :3] *= rgba[..., 3:]       # premultiply
    frame = frame_from_rgb(rgba, color=CSP_SRGB)
    frame.repr = ColorRepr(sys=ColorSystem.RGB, levels=ColorLevels.FULL,
                           alpha=AlphaMode.PREMULTIPLIED)
    p = RenderParams(peak_detect=None, dither=None)
    # independent target: output rgb = rgba/alpha
    tgt_ind = Target(w=16, h=16, color=CSP_SRGB)
    out = np.asarray(Renderer().render(frame, tgt_ind, p))
    expect = rgba[..., :3] / rgba[..., 3:]
    np.testing.assert_allclose(out[:3], np.moveaxis(expect, -1, 0),
                               atol=3e-2)
    # premultiplied target: roundtrips to the original
    tgt_pre = Target(w=16, h=16, color=CSP_SRGB,
                     repr=ColorRepr(sys=ColorSystem.RGB,
                                    levels=ColorLevels.FULL,
                                    alpha=AlphaMode.PREMULTIPLIED))
    out2 = np.asarray(Renderer().render(frame, tgt_pre, p))
    np.testing.assert_allclose(out2[:3], np.moveaxis(rgba[..., :3], -1, 0),
                               atol=3e-2)


def test_xyz_input():
    """XYZ (ST 428) input decodes through the DCDM curve to sane RGB."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, ColorSpace,
                                                ColorTransfer)
    # encode a known gray: XYZ of D65 white at half signal
    xyz = np.full((8, 8, 3), 0.6, np.float32)
    frame = frame_from_rgb(xyz, color=ColorSpace(
        ColorPrimaries.BT_709, ColorTransfer.ST428))
    frame.repr = ColorRepr(sys=ColorSystem.XYZ, levels=ColorLevels.FULL)
    out = np.asarray(Renderer().render(
        frame, Target(w=8, h=8, color=ColorSpace(
            ColorPrimaries.BT_709, ColorTransfer.ST428)),
        RenderParams(peak_detect=None, dither=None,
                     linear_scaling=False)))
    assert np.all(np.isfinite(out))
    assert out.max() <= 1.0 and out.min() >= 0.0


def test_meta_key_includes_hdr_metadata():
    """Frames/targets differing only in HDR mastering metadata must NOT
    share a compiled pipeline (stale tone curve); ADVICE r1 high."""
    from dataclasses import replace as drep
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, ColorSpace,
                                                ColorTransfer, HdrMetadata)
    rgb = np.full((8, 8, 3), 0.5, np.float32)
    c1 = ColorSpace(ColorPrimaries.BT_2020, ColorTransfer.PQ,
                    HdrMetadata(max_luma=1000.0))
    c2 = ColorSpace(ColorPrimaries.BT_2020, ColorTransfer.PQ,
                    HdrMetadata(max_luma=4000.0))
    f1 = frame_from_rgb(rgb, color=c1)
    f2 = frame_from_rgb(rgb, color=c2)
    assert f1.meta_key() != f2.meta_key()
    t1 = Target(w=8, h=8, color=c1)
    t2 = Target(w=8, h=8, color=c2)
    assert t1.meta_key() != t2.meta_key()

    # and the render outputs actually differ (different tone curves)
    tgt = Target(w=8, h=8)
    params = RenderParams(peak_detect=None, dither=None,
                          tone_mapping_function="bt2390")
    r = Renderer()
    o1 = np.asarray(r._render_once(f1, tgt, params))
    o2 = np.asarray(r._render_once(f2, tgt, params))
    assert len(r._cache) == 2
    assert not np.allclose(o1, o2, atol=1e-4)


def test_icc_meta_key_content_signature():
    """ICC targets key by content signature, not object identity."""
    from libplacebo_tpu.core.icc import parse_icc
    from tests.test_icc_h274 import _make_profile
    data = _make_profile()
    p1 = parse_icc(data)
    p2 = parse_icc(data)
    assert p1 is not p2
    t1 = Target(w=8, h=8, icc=p1)
    t2 = Target(w=8, h=8, icc=p2)
    assert t1.meta_key() == t2.meta_key()


def test_render_hdr_passthrough_ictcp_target():
    """HDR -> HDR output: render a PQ frame into a BT.2100 ICtCp PQ
    target (encode_color now covers every system; VERDICT r1 missing #6)."""
    from libplacebo_tpu.core.colorspace import CSP_BT2100_PQ
    rng = np.random.default_rng(11)
    rgb = (rng.random((16, 24, 3)) * 0.8).astype(np.float32)
    frame = frame_from_rgb(rgb, color=CSP_BT2100_PQ)
    target = Target(w=48, h=32, color=CSP_BT2100_PQ,
                    repr=ColorRepr(sys=ColorSystem.BT_2100_PQ,
                                   levels=ColorLevels.FULL))
    out = np.asarray(Renderer()._render_once(
        frame, target, RenderParams(dither=None)))
    assert out.shape == (3, 32, 48)
    assert np.all(np.isfinite(out))


def test_render_sdr_to_hdr_pq_target():
    """SDR -> HDR display (inverse direction): sRGB frame to a PQ RGB
    target renders finite, in-range output."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB, CSP_BT2100_PQ
    rng = np.random.default_rng(12)
    rgb = rng.random((16, 24, 3)).astype(np.float32)
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    target = Target(w=48, h=32, color=CSP_BT2100_PQ)
    out = np.asarray(Renderer()._render_once(
        frame, target, RenderParams(dither=None)))
    assert np.all(np.isfinite(out))
    assert out.max() <= 1.0


def test_render_cone_distortion():
    """Color-blindness simulation in the renderer (VERDICT r1 missing
    #5): monochromacy turns the output achromatic; normal vision is a
    no-op."""
    from libplacebo_tpu.core.colorspace import (CSP_SRGB,
                                                VISION_MONOCHROMACY,
                                                VISION_NORMAL)
    rng = np.random.default_rng(13)
    rgb = rng.random((16, 24, 3)).astype(np.float32)
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    target = Target(w=24, h=16, color=CSP_SRGB)
    params = RenderParams(dither=None, cone=VISION_MONOCHROMACY)
    out = np.asarray(Renderer()._render_once(frame, target, params))
    np.testing.assert_allclose(out[0], out[1], atol=1e-5)
    np.testing.assert_allclose(out[1], out[2], atol=1e-5)
    params_n = RenderParams(dither=None, cone=VISION_NORMAL)
    out_n = np.asarray(Renderer()._render_once(frame, target, params_n))
    ref = np.asarray(Renderer()._render_once(
        frame, target, RenderParams(dither=None)))
    np.testing.assert_allclose(out_n, ref, atol=1e-6)


def test_bad_params_surface_unchanged():
    """User errors must NOT be silently degraded away (reference only
    degrades on shader/GPU failures, renderer.c:777-788)."""
    frame = _yuv_frame(h=16, w=24)
    r = Renderer()
    with pytest.raises(Exception) as ei:
        r.render(frame, Target(w=32, h=24),
                 RenderParams(upscaler="not_a_filter"))
    assert "not_a_filter" in str(ei.value)
    assert not r.errors                      # nothing was degraded


def test_degradation_logs_and_recovers(monkeypatch):
    """A genuinely broken stage degrades gracefully AND logs the
    exception + disabled feature."""
    from libplacebo_tpu.core import log as core_log
    from libplacebo_tpu.ops import deband as ops_deband

    records = []
    lg = core_log.Log(level=core_log.LogLevel.ERR,
                      callback=lambda lvl, msg: records.append(msg))
    monkeypatch.setattr(core_log, "default_log", lambda: lg)

    def broken(*a, **k):
        raise RuntimeError("synthetic backend failure")
    monkeypatch.setattr(ops_deband, "deband", broken)

    frame = _yuv_frame(h=16, w=24)
    r = Renderer()
    out = r.render(frame, Target(w=24, h=16),
                   RenderParams(deband=ops_deband.DebandParams()))
    assert np.all(np.isfinite(np.asarray(out)))
    assert "deband" in r.errors
    assert any("deband" in m and "synthetic backend failure" in m
               for m in records)


def test_pipeline_cache_is_bounded():
    from libplacebo_tpu.render.renderer import _MAX_CACHED_PIPELINES
    r = Renderer()
    frame = frame_from_rgb(np.full((4, 6, 3), 0.5, np.float32),
                           color=CSP_SRGB)
    p = RenderParams(peak_detect=None, dither=None, linear_scaling=False)
    for i in range(_MAX_CACHED_PIPELINES + 10):
        r.render(frame, Target(w=6 + i, h=4, color=CSP_SRGB), p)
    assert len(r._cache) <= _MAX_CACHED_PIPELINES


def test_render_color_adjustment():
    """ColorAdjustment flows through the renderer: gamma changes
    mid-tones; saturation=0 makes the output achromatic."""
    from libplacebo_tpu.core.colorspace import ColorAdjustment
    frame = _yuv_frame(h=16, w=24)
    tgt = Target(w=24, h=16)
    p0 = RenderParams(peak_detect=None, dither=None)
    base = np.asarray(Renderer()._render_once(frame, tgt, p0))
    p1 = RenderParams(peak_detect=None, dither=None,
                      color_adjustment=ColorAdjustment(gamma=2.0))
    out = np.asarray(Renderer()._render_once(frame, tgt, p1))
    assert not np.allclose(out, base, atol=1e-3)
    p2 = RenderParams(peak_detect=None, dither=None,
                      color_adjustment=ColorAdjustment(saturation=0.0))
    gray = np.asarray(Renderer()._render_once(frame, tgt, p2))
    np.testing.assert_allclose(gray[0], gray[1], atol=1e-3)
    np.testing.assert_allclose(gray[1], gray[2], atol=1e-3)


def test_fused_colormap_matches_plain(monkeypatch):
    """The fused Pallas color epilogue (ops.pallas.color_map, interpret
    mode on CPU) produces the same frame as the plain XLA stages — same
    stage closures, two lowerings.  Knife-edge dither pixels may flip by
    exactly 1 LSB under float reassociation."""
    from tests.test_parallel import _flagship_frames
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    frames = _flagship_frames(1, 64, 128, seed=3)
    target = Target(w=256, h=128, color=CSP_SRGB, bit_depth=8)
    params = RenderParams(upscaler="ewa_lanczos")
    monkeypatch.setenv("LPTPU_FUSED_COLORMAP", "1")
    out_fused = np.asarray(Renderer()._render_once(frames[0], target, params))
    monkeypatch.setenv("LPTPU_FUSED_COLORMAP", "0")
    out_ref = np.asarray(Renderer()._render_once(frames[0], target, params))
    diff = np.abs(out_fused - out_ref)
    assert diff.max() <= 1 / 255 + 1e-6, diff.max()
    assert (diff > 1e-6).mean() < 1e-3


def test_fused_colormap_ineligible_paths(monkeypatch):
    """Interrupted tails (ICC target, conversion LUT, alpha, sub-rect
    composite) fall back to the plain stages — never silently skipped."""
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.render.renderer import RenderParams, Renderer, Target
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    monkeypatch.setenv("LPTPU_FUSED_COLORMAP", "1")
    r = Renderer
    dst_crop = RectF(0, 0, 256, 128)
    base = dict(use_peak=False, phased=None, has_alpha=False,
                dst_w=256, dst_h=128, dst_crop=dst_crop)
    params = RenderParams()
    target = Target(w=256, h=128, color=CSP_SRGB, bit_depth=8)
    src = CSP_SRGB.infer()
    dst = CSP_SRGB.infer(256, 128)
    assert r._fused_tail(params, src, dst, target, **base) is not None
    # alpha interrupts
    assert r._fused_tail(params, src, dst, target,
                         **{**base, "has_alpha": True}) is None
    # sub-rect composite interrupts
    assert r._fused_tail(params, src, dst, target,
                         **{**base, "dst_w": 128,
                            "dst_crop": RectF(0, 0, 128, 128)}) is None
    # unaligned width
    assert r._fused_tail(params, src, dst,
                         Target(w=250, h=128, color=CSP_SRGB),
                         **{**base, "dst_w": 250,
                            "dst_crop": RectF(0, 0, 250, 128)}) is None
    # degradation flag forces plain path
    from dataclasses import replace
    assert r._fused_tail(replace(params, disable_fused_colormap=True),
                         src, dst, target, **base) is None


def test_frame_is_cropped_and_chroma_location():
    """Reference pl_frame_is_cropped / pl_frame_set_chroma_location
    (renderer.c:4098 / :4048)."""
    import jax.numpy as jnp
    from libplacebo_tpu.render.frame import Frame, Plane
    y = Plane(jnp.zeros((1, 8, 8)), (0,))
    uv = Plane(jnp.zeros((2, 4, 4)), (1, 2))
    f = Frame(planes=[y, uv])
    assert not f.is_cropped()
    f.crop = RectF(0, 0, 8, 8)
    assert not f.is_cropped()
    f.crop = RectF(1, 0, 8, 8)
    assert f.is_cropped()
    f.crop = RectF(0, 0, 7, 8)
    assert f.is_cropped()
    # flipped full-frame crop is not cropped
    f.crop = RectF(8, 8, 0, 0)
    assert not f.is_cropped()

    f.set_chroma_location("top_left")
    assert f.planes[1].shift_x == -0.5 and f.planes[1].shift_y == -0.5
    assert f.planes[0].shift_x == 0.0   # ref plane untouched


def test_renderer_get_reset_errors():
    """Reference pl_renderer_get_errors / pl_renderer_reset_errors
    (renderer.c:4194/4203): full and selective clearing."""
    from libplacebo_tpu.render.renderer import Renderer
    rr = Renderer()
    rr.errors.update({"peak_detect", "grain"})
    rr._disabled_hooks.update({0xdead, 0xbeef})
    flags, hooks = rr.get_errors()
    assert flags == {"peak_detect", "grain"} and hooks == {0xdead, 0xbeef}
    # selective reset
    rr.reset_errors(errors=["grain"], hooks=[0xdead])
    flags, hooks = rr.get_errors()
    assert flags == {"peak_detect"} and hooks == {0xbeef}
    # full reset
    rr.reset_errors()
    assert rr.get_errors() == (frozenset(), frozenset())


def test_separable_antiringing_strength_active():
    """VERDICT r4 #1: antiringing_strength was silently inert for
    separable scalers (the stock mpv `upscaler=lanczos,
    antiringing_strength=0.5` combination).  A step-edge render must now
    show reduced over/undershoot, and strength=0.0 must be bit-identical
    to the default."""
    # a 0.25 -> 0.75 step keeps the ringing inside [0, 1] (the encode
    # stage clips overshoot past white/black, which would mask AR)
    rgb = np.full((24, 32, 3), 0.25, np.float32)
    rgb[:, 16:] = 0.75
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    tgt = Target(w=96, h=72, color=CSP_SRGB, bit_depth=0)
    params0 = RenderParams(upscaler="lanczos")
    params1 = RenderParams(upscaler="lanczos", antiringing_strength=1.0)
    out0 = np.asarray(Renderer().render(frame, tgt, params0))
    out1 = np.asarray(Renderer().render(frame, tgt, params1))
    # lanczos rings past the step's plateaus; AR=1 clamps the ringing
    assert out0.max() > 0.7505 and out0.min() < 0.2495
    assert out1.max() < out0.max() - 1e-4
    assert out1.min() > out0.min() + 1e-4
    out_z = np.asarray(Renderer().render(
        frame, tgt, RenderParams(upscaler="lanczos",
                                 antiringing_strength=0.0)))
    np.testing.assert_array_equal(out_z, out0)


def test_extreme_scrgb_input_stays_finite():
    """Value-range robustness net: scRGB linear input legally carries
    negatives and HDR magnitudes (up to ~50 in NORM scale); no pipeline
    stage may assume [0,1] texels.  The polar-AR softmax did (its
    (cc+0.1)^32 base overflowed f32 on linear light, NaN-poisoning HDR
    frames with ewa_lanczos4sharpest) — keep the whole preset spread
    pinned finite on hostile input."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                ColorSpace, ColorTransfer,
                                                CSP_BT2100_PQ)
    from libplacebo_tpu.render.frame import frame_from_rgb

    rng = np.random.default_rng(9)
    rgb = (rng.random((24, 32, 3)).astype(np.float32) * 60 - 10)
    fr = frame_from_rgb(rgb, color=ColorSpace(ColorPrimaries.BT_709,
                                              ColorTransfer.LINEAR))
    tgt_sdr = Target(w=64, h=48, color=CSP_SRGB, bit_depth=8)
    tgt_hdr = Target(w=64, h=48, color=CSP_BT2100_PQ, bit_depth=10)
    cases = [
        (tgt_sdr, RenderParams(upscaler="ewa_lanczos4sharpest")),
        (tgt_sdr, RenderParams(upscaler="lanczos",
                               antiringing_strength=1.0)),
        (tgt_sdr, RenderParams(gamut_mapping="perceptual")),
        (tgt_sdr, RenderParams(tone_mapping_function="st2094-40")),
        (tgt_hdr, RenderParams()),
    ]
    for tgt, p in cases:
        out = np.asarray(Renderer()._render_once(fr, tgt, p))
        assert np.isfinite(out).all(), p
