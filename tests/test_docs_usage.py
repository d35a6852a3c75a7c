"""Smoke tests for docs/USAGE.md: every documented flow must run
(small sizes; the doc uses production sizes)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                            ColorRepr, ColorSystem,
                                            CSP_BT2100_PQ, CSP_SRGB)
from libplacebo_tpu.core.common import RectF
from libplacebo_tpu.render.frame import (Overlay, OverlayPart,
                                         frame_from_yuv420p)
from libplacebo_tpu.render.renderer import (Renderer, RenderParams,
                                            Target, render_image_mix)


def _hdr_frame(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(16, 236, (h, w), dtype=np.uint8)
    u = rng.integers(16, 241, (h // 2, w // 2), dtype=np.uint8)
    v = rng.integers(16, 241, (h // 2, w // 2), dtype=np.uint8)
    return frame_from_yuv420p(
        y, u, v, color=CSP_BT2100_PQ,
        repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                       levels=ColorLevels.LIMITED,
                       bits=BitEncoding(8, 8, 0)))


def test_usage_render_and_options_and_peak():
    from libplacebo_tpu.core.options import Options
    frame = _hdr_frame()
    target = Target(w=192, h=128, color=CSP_SRGB, bit_depth=8)
    r = Renderer()
    opts = Options()
    opts.parse("upscaler=ewa_lanczos,tone_mapping=bt2390,"
               "peak_percentile=99.995")
    out = np.asarray(r.render(frame, target, opts.params))
    assert out.shape == (3, 128, 192) and np.isfinite(out).all()
    assert "upscaler=ewa_lanczos" in opts.save()
    md = r.get_hdr_metadata()
    assert md is not None
    r.reset_peak_detection()
    errors, hooks = r.get_errors()
    assert errors == frozenset() and hooks == frozenset()


def test_usage_overlays_and_queue():
    from libplacebo_tpu.render.queue import (FrameQueue, QueueMode,
                                             QueueParams, QueueStatus,
                                             SourceFrame)
    frame = _hdr_frame()
    glyphs = jnp.asarray(np.ones((1, 8, 24), np.float32))
    frame.overlays = [Overlay(
        data=glyphs, mode="monochrome", coords="src_frame",
        parts=(OverlayPart(src=RectF(0, 0, 24, 8),
                           dst=RectF(10, 40, 60, 56)),))]
    logo = jnp.asarray(np.random.default_rng(1).random(
        (4, 8, 8), np.float32))
    target = Target(w=192, h=128, color=CSP_SRGB,
                    overlays=(Overlay(data=logo,
                                      rect=RectF(180, 4, 188, 12)),))
    renderer = Renderer()
    queue = FrameQueue()
    frames = [_hdr_frame(seed=i) for i in range(4)]
    for i, f in enumerate(frames):
        f.pts = i / 24.0
        f.overlays = frame.overlays
        assert queue.push_block(SourceFrame(pts=f.pts,
                                            map=lambda _f=f: _f),
                                timeout=1.0)
    queue.push(None)
    st, mix = queue.update(QueueParams(pts=1 / 24.0, radius=1.0,
                                       vsync_duration=1 / 60.0),
                           QueueMode.INTERPOLATE)
    assert st == QueueStatus.OK
    out = np.asarray(render_image_mix(renderer, mix, target,
                                      RenderParams(peak_detect=None)))
    assert out.shape[-2:] == (128, 192) and np.isfinite(out).all()


def test_usage_interop_icc_lut_hooks():
    from libplacebo_tpu.utils.interop import frame_from_avframe_like
    from libplacebo_tpu.core.lut import parse_cube
    from libplacebo_tpu.render.mpv_hooks import (parse_user_shader,
                                                 user_shader_hook)
    av = {"format": "yuv420p",
          "data": [np.zeros((16, 16), np.uint8),
                   np.zeros((8, 8), np.uint8),
                   np.zeros((8, 8), np.uint8)],
          "colorspace": "bt709", "color_range": "tv",
          "sample_aspect_ratio": 1.0}
    f = frame_from_avframe_like(av)
    assert f.planes[0].w == 16

    lut = parse_cube("LUT_3D_SIZE 2\n0 0 0\n1 0 0\n0 1 0\n1 1 0\n"
                     "0 0 1\n1 0 1\n0 1 1\n1 1 1\n")
    shader = parse_user_shader(
        "//!HOOK LUMA\n//!BIND HOOKED\n"
        "vec4 hook() { return HOOKED_texOff(vec2(0.0)) * 1.1; }\n")
    params = RenderParams(lut=lut, lut_type="conversion",
                          hooks=(user_shader_hook(shader),),
                          peak_detect=None)
    out = np.asarray(Renderer().render(
        _hdr_frame(), Target(w=128, h=96, color=CSP_SRGB), params))
    assert np.isfinite(out).all()


def test_usage_multichip():
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from libplacebo_tpu.parallel import (build_sharded_pipeline,
                                         make_mesh, shard_planes,
                                         sharded_state_init)
    frame = _hdr_frame()
    target = Target(w=192, h=128, color=CSP_SRGB)
    params = RenderParams(upscaler="lanczos", peak_detect=None)
    mesh = make_mesh(data=2, spatial=4)
    step = build_sharded_pipeline(mesh, frame.meta_key()[0], frame.repr,
                                  frame.color, target, params)
    frames = [_hdr_frame(seed=i) for i in range(2)]
    planes = [np.stack([np.asarray(f.planes[i].data) for f in frames])
              for i in range(len(frame.planes))]
    state = sharded_state_init(mesh, 2)
    out, state = step(state, *shard_planes(mesh, planes))
    assert out.shape == (2, 3, 128, 192)


def test_custom_shaders_doc_example():
    """The full example in docs/custom-shaders.md must parse and run
    (extracted from the doc so it can't rot)."""
    import os
    import re
    from libplacebo_tpu.render.mpv_hooks import user_shader_hook
    from libplacebo_tpu.render.frame import frame_from_rgb
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "docs", "custom-shaders.md")) as f:
        doc = f.read()
    m = re.search(r"doc = r'''(.*?)'''", doc, re.S)
    assert m, "custom-shaders.md lost its full example"
    hook = user_shader_hook(m.group(1), parameters={"intensity": 1.0})
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    base = np.asarray(Renderer().render(frame_from_rgb(img),
                                        Target(w=64, h=48)))
    out = np.asarray(Renderer().render(
        frame_from_rgb(img), Target(w=64, h=48),
        RenderParams(hooks=(hook,))))
    assert out.shape == base.shape and np.isfinite(out).all()
    assert not np.allclose(out, base)   # the unsharp mask did something
