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
    ref = np.asarray(Renderer()._render_once(frame, target, params))
    monkeypatch.setenv("LPTPU_PHASED_TAIL", "1")
    out = np.asarray(Renderer()._render_once(frame, target, params))
    np.testing.assert_allclose(out, ref, atol=1e-6)
