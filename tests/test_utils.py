"""Upload helpers + interop tests — oracle: reference src/tests/utils.c
(plane format finding) + libav mapping semantics."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core.colorspace import ColorLevels, ColorSystem
from libplacebo_tpu.utils import interop, upload


def test_upload_plane_8bit():
    data = np.arange(16, dtype=np.uint8).reshape(4, 4) * 17
    p = upload.upload_plane(upload.PlaneData(data, (0,)))
    assert p.data.shape == (1, 4, 4)
    np.testing.assert_allclose(np.asarray(p.data)[0],
                               data.astype(np.float32) / 255.0, atol=1e-6)


def test_upload_plane_bitshifted_xyz12():
    """12-bit data shifted into 16-bit samples (the xyz12 case from
    colorspace.h docs)."""
    raw12 = np.array([[0, 2048, 4095]], np.uint16)
    shifted = raw12 << 4
    p = upload.upload_plane(upload.PlaneData(shifted, (0,), bit_depth=12,
                                             bit_shift=4))
    np.testing.assert_allclose(np.asarray(p.data)[0, 0],
                               raw12[0] / 4095.0, atol=1e-6)


def test_frame_from_planes_chroma_shift():
    y = np.zeros((8, 8), np.uint8)
    uv = np.zeros((4, 4, 2), np.uint8)
    f = upload.frame_from_planes(
        [upload.PlaneData(y, (0,)), upload.PlaneData(uv, (1, 2))],
        chroma_location="left")
    assert f.planes[1].shift_x == -0.5
    assert f.planes[1].shift_y == 0.0
    f2 = upload.frame_from_planes(
        [upload.PlaneData(y, (0,)), upload.PlaneData(uv, (1, 2))],
        chroma_location="top_left")
    assert f2.planes[1].shift_y == -0.5


def test_avframe_like_yuv420p():
    rng = np.random.default_rng(0)
    av = dict(format="yuv420p",
              data=[rng.integers(0, 255, (16, 24), dtype=np.uint8),
                    rng.integers(0, 255, (8, 12), dtype=np.uint8),
                    rng.integers(0, 255, (8, 12), dtype=np.uint8)],
              colorspace="bt709", color_range="tv",
              color_trc="bt709", color_primaries="bt709")
    f = interop.frame_from_avframe_like(av)
    assert len(f.planes) == 3
    assert f.repr.sys == ColorSystem.BT_709
    assert f.repr.levels == ColorLevels.LIMITED
    assert f.w == 24 and f.h == 16


def test_avframe_like_nv12():
    av = dict(format="nv12",
              data=[np.zeros((16, 24), np.uint8),
                    np.zeros((8, 12, 2), np.uint8)])
    f = interop.frame_from_avframe_like(av)
    assert f.planes[1].component_mapping == (1, 2)


def test_avframe_like_p010():
    # ffmpeg's p010le is MSB-aligned: sample 512 is stored as 512 << 6
    av = dict(format="p010le",
              data=[np.full((8, 8), 512 << 6, np.uint16),
                    np.full((4, 4, 2), 512 << 6, np.uint16)])
    f = interop.frame_from_avframe_like(av)
    # 10-bit normalization after the alignment shift
    np.testing.assert_allclose(float(f.planes[0].data[0, 0, 0]),
                               512 / 1023.0, atol=1e-5)


def test_avframe_unknown_format():
    with pytest.raises(ValueError):
        interop.frame_from_avframe_like(dict(format="weird", data=[]))


def test_dlpack_roundtrip():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    j = interop.from_dlpack(x)
    np.testing.assert_array_equal(np.asarray(j), x)


def test_torch_interop():
    torch = pytest.importorskip("torch")
    t = torch.arange(12, dtype=torch.float32).reshape(3, 4)
    j = interop.from_torch(t)
    np.testing.assert_array_equal(np.asarray(j), t.numpy())
    t2 = interop.to_torch(j)
    np.testing.assert_array_equal(t2.numpy(), t.numpy())


def test_avframe_render_end_to_end():
    from libplacebo_tpu.render.renderer import Renderer, Target
    rng = np.random.default_rng(1)
    av = dict(format="yuv420p10le",
              data=[rng.integers(64, 940, (32, 48), dtype=np.uint16),
                    rng.integers(64, 960, (16, 24), dtype=np.uint16),
                    rng.integers(64, 960, (16, 24), dtype=np.uint16)],
              colorspace="bt709", color_range="tv")
    f = interop.frame_from_avframe_like(av)
    out = Renderer().render(f, Target(w=96, h=64))
    assert out.shape == (3, 64, 96)
    assert np.all(np.isfinite(np.asarray(out)))


# --- side data + dav1d interop (reference utils/libav_internal.h:384,
# utils/dav1d.h; VERDICT r1 missing #7) ---------------------------------

def _yuv_av(fmt="yuv420p", h=16, w=24, **extra):
    import numpy as np
    rng = np.random.default_rng(0)
    av = {"format": fmt,
          "data": [rng.integers(16, 235, (h, w), dtype=np.uint8),
                   rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8),
                   rng.integers(16, 240, (h // 2, w // 2), dtype=np.uint8)],
          "colorspace": "bt709", "color_range": "tv"}
    av.update(extra)
    return av


def test_avframe_side_data_hdr():
    av = _yuv_av(
        colorspace="bt2020nc", color_trc="smpte2084",
        color_primaries="bt2020",
        mastering_display_metadata={
            "display_primaries": [[0.708, 0.292], [0.170, 0.797],
                                  [0.131, 0.046]],
            "white_point": [0.3127, 0.3290],
            "min_luminance": 0.005, "max_luminance": 1000.0},
        content_light_level={"max_cll": 800.0, "max_fall": 300.0},
        hdr10plus={"scene_max": [500.0, 500.0, 500.0],
                   "scene_avg": 120.0})
    f = interop.frame_from_avframe_like(av)
    assert f.color.hdr.max_luma == 1000.0
    assert f.color.hdr.min_luma == 0.005
    assert f.color.hdr.max_cll == 800.0
    assert f.color.hdr.max_fall == 300.0
    assert f.color.hdr.scene_avg == 120.0
    assert abs(f.color.hdr.prim.red.x - 0.708) < 1e-6
    # HDR metadata keys the pipeline cache (ADVICE r1)
    f2 = interop.frame_from_avframe_like(_yuv_av(
        colorspace="bt2020nc", color_trc="smpte2084",
        color_primaries="bt2020"))
    assert f.meta_key() != f2.meta_key()


def test_avframe_side_data_film_grain_and_crop():
    av = _yuv_av(
        film_grain={"type": "av1", "seed": 7, "av1": {
            "num_points_y": 2, "points_y": ((0, 32), (255, 64)),
            "ar_coeff_lag": 0}},
        crop_left=2, crop_top=4, rotation=90)
    f = interop.frame_from_avframe_like(av)
    assert f.film_grain is not None and f.film_grain.type == "av1"
    assert f.film_grain.seed == 7
    assert f.film_grain.av1.num_points_y == 2
    assert f.crop is not None and f.crop.x0 == 2 and f.crop.y0 == 4
    assert int(f.rotation) == 1


def test_avframe_roundtrip_export():
    av = _yuv_av(colorspace="bt709", color_trc="bt709",
                 color_primaries="bt709",
                 content_light_level={"max_cll": 600.0, "max_fall": 200.0})
    f = interop.frame_from_avframe_like(av)
    out = interop.frame_to_avframe_like(f)
    assert out["colorspace"] == "bt709"
    assert out["color_range"] == "tv"
    assert out["content_light_level"]["max_cll"] == 600.0
    assert len(out["data"]) == 3


def test_dav1d_picture_mapping():
    import numpy as np
    rng = np.random.default_rng(1)
    pic = {
        "layout": "I420", "bitdepth": 10,
        "data": [rng.integers(64, 940, (16, 24), dtype=np.uint16),
                 rng.integers(64, 960, (8, 12), dtype=np.uint16),
                 rng.integers(64, 960, (8, 12), dtype=np.uint16)],
        "seq_hdr": {"mtrx": 9, "pri": 9, "trc": 16, "color_range": 0,
                    "chr": 1},
        "frame_hdr": {"film_grain": {
            "seed": 3, "num_y_points": 1, "y_points": ((128, 40),),
        }},
    }
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                ColorSystem, ColorTransfer)
    f = interop.frame_from_dav1d_picture_like(pic)
    assert f.repr.sys == ColorSystem.BT_2020_NC
    assert f.color.primaries == ColorPrimaries.BT_2020
    assert f.color.transfer == ColorTransfer.PQ
    assert f.repr.bits.color_depth == 10
    assert f.film_grain is not None and f.film_grain.av1.num_points_y == 1
    # renders end-to-end
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    out = np.asarray(Renderer()._render_once(
        f, Target(w=24, h=16, color=CSP_SRGB),
        RenderParams(peak_detect=None, dither=None)))
    assert np.all(np.isfinite(out))


def test_frame_icc_profile_decodes_source():
    """A frame-attached ICC profile replaces the standard linearization
    (reference pl_icc_decode on the image side)."""
    import numpy as np
    from tests.test_icc_h274 import _make_profile
    from libplacebo_tpu.core.icc import parse_icc
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    rng = np.random.default_rng(2)
    rgb = rng.random((16, 24, 3)).astype(np.float32)
    f = frame_from_rgb(rgb, color=CSP_SRGB)
    f.icc = parse_icc(_make_profile(gamma=2.6))
    p = RenderParams(peak_detect=None, dither=None)
    tgt = Target(w=48, h=32, color=CSP_SRGB)
    out_icc = np.asarray(Renderer()._render_once(f, tgt, p))
    f2 = frame_from_rgb(rgb, color=CSP_SRGB)
    out_std = np.asarray(Renderer()._render_once(f2, tgt, p))
    assert f.meta_key() != f2.meta_key()
    assert not np.allclose(out_icc, out_std, atol=1e-3)
    assert np.all(np.isfinite(out_icc))


def test_frame_from_pyav_gated():
    """frame_from_pyav maps a real av.VideoFrame when PyAV exists;
    a duck-typed stand-in exercises the mapping logic without it."""
    import numpy as np
    pytest_av = True
    try:
        import av  # noqa: F401
    except ImportError:
        pytest_av = False
    from libplacebo_tpu.utils.interop import frame_from_pyav

    class _Plane:
        def __init__(self, arr):
            self._b = arr.tobytes()
            self.line_size = arr.shape[1] * arr.itemsize
        def __bytes__(self):
            return self._b

    class _Fmt:
        name = "yuv420p"

    class _F:
        format = _Fmt()
        width, height = 32, 16
        colorspace = "bt709"
        color_range = 1
        color_primaries = "bt709"
        color_trc = "bt709"
        side_data = ()
        def __init__(self):
            rng = np.random.default_rng(0)
            self.planes = [
                _Plane((rng.random((16, 32)) * 255).astype(np.uint8)),
                _Plane((rng.random((8, 16)) * 255).astype(np.uint8)),
                _Plane((rng.random((8, 16)) * 255).astype(np.uint8))]

    f = frame_from_pyav(_F())
    assert f.w == 32 and f.h == 16
    assert len(f.planes) == 3
    if pytest_av:
        # a real decoded frame (synthesized) through the same path
        frame = av.VideoFrame(32, 16, "yuv420p")
        f2 = frame_from_pyav(frame)
        assert f2.w == 32


# ---------------------------------------------------------------------------
# YUV4MPEG2 (.y4m) + PNG I/O (utils/y4m.py)
# ---------------------------------------------------------------------------

def _y4m_bytes(w=16, h=8, n=2, csp="420mpeg2", depth=8, interlace="p",
               seed=0):
    import io
    from libplacebo_tpu.utils.y4m import Y4MWriter
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    wr = Y4MWriter(buf, w, h, fps=(30000, 1001), csp=csp,
                   interlace=interlace)
    sx, sy, d, n_planes, _ = wr.info.layout
    maxv = (1 << d) - 1
    dtype = np.uint16 if d > 8 else np.uint8
    frames = []
    for _ in range(n):
        cw, ch = (w + sx) >> sx, (h + sy) >> sy
        planes = [rng.integers(0, maxv + 1, (h, w)).astype(dtype)]
        planes += [rng.integers(0, maxv + 1, (ch, cw)).astype(dtype)
                   for _ in range(n_planes - 1)]
        wr.write(planes)
        frames.append(planes)
    return buf.getvalue(), frames


@pytest.mark.parametrize("csp,depth", [("420mpeg2", 8), ("420jpeg", 8),
                                       ("422", 8), ("444", 8),
                                       ("mono", 8), ("420p10", 10),
                                       ("444p16", 16)])
def test_y4m_roundtrip_raw(csp, depth):
    import io
    from libplacebo_tpu.utils.y4m import Y4MReader
    data, frames = _y4m_bytes(csp=csp)
    r = Y4MReader(io.BytesIO(data))
    assert r.info.csp == csp
    assert r.info.bit_depth == depth
    assert float(r.info.fps) == pytest.approx(30000 / 1001)
    for want in frames:
        got = r.read_raw()
        for a, b in zip(want, got):
            np.testing.assert_array_equal(a, b)
    assert r.read_raw() is None


def test_y4m_reader_frames_render():
    """Frames demuxed from a .y4m render through the full pipeline."""
    import io
    from libplacebo_tpu.utils.y4m import Y4MReader
    from libplacebo_tpu.render.renderer import Renderer, RenderParams, \
        Target
    data, _ = _y4m_bytes(w=32, h=16, n=1)
    frame = next(iter(Y4MReader(io.BytesIO(data))))
    assert frame.repr.sys == ColorSystem.BT_601          # SD heuristic
    assert frame.repr.levels == ColorLevels.LIMITED
    assert frame.planes[1].shift_x == -0.5               # mpeg2 siting
    out = Renderer().render(frame, Target(w=64, h=32),
                            RenderParams(upscaler="bilinear"))
    assert out.shape == (3, 32, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_y4m_interlaced_and_siting_tags():
    import io
    from libplacebo_tpu.ops.deinterlace import Field
    from libplacebo_tpu.utils.y4m import Y4MReader
    data, _ = _y4m_bytes(csp="420jpeg", interlace="t")
    f = next(iter(Y4MReader(io.BytesIO(data))))
    assert f.first_field == Field.TOP
    assert f.planes[1].shift_x == 0.0                    # jpeg = center
    data, _ = _y4m_bytes(csp="420paldv", interlace="b")
    f = next(iter(Y4MReader(io.BytesIO(data))))
    assert f.first_field == Field.BOTTOM
    assert f.planes[1].shift_x == -0.5 and f.planes[1].shift_y == -0.5


def test_y4m_writer_downsamples_fullres():
    """Full-resolution float planes are box-averaged to 4:2:0."""
    import io
    from libplacebo_tpu.utils.y4m import Y4MReader, Y4MWriter
    w, h = 8, 4
    rng = np.random.default_rng(1)
    yuv = rng.random((3, h, w)).astype(np.float32)
    buf = io.BytesIO()
    with Y4MWriter(buf, w, h, csp="420jpeg") as wr:
        wr.write(yuv)
    buf.seek(0)
    y, u, v = Y4MReader(buf).read_raw()
    np.testing.assert_array_equal(
        y, np.clip(np.rint(yuv[0] * 255), 0, 255).astype(np.uint8))
    want_u = yuv[1].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
    np.testing.assert_array_equal(
        u, np.clip(np.rint(want_u * 255), 0, 255).astype(np.uint8))
    assert v.shape == (h // 2, w // 2)


def test_y4m_header_errors():
    import io
    from libplacebo_tpu.utils.y4m import Y4MReader, Y4MWriter
    with pytest.raises(ValueError, match="magic"):
        Y4MReader(io.BytesIO(b"JUNK W2 H2\n"))
    with pytest.raises(ValueError, match="colorspace"):
        Y4MReader(io.BytesIO(b"YUV4MPEG2 W2 H2 C999\n"))
    with pytest.raises(ValueError, match="W/H"):
        Y4MReader(io.BytesIO(b"YUV4MPEG2 F25:1\n"))
    with pytest.raises(ValueError, match="truncated"):
        Y4MReader(io.BytesIO(b"YUV4MPEG2 W4 H4\nFRAME\nxx")).read_raw()
    with pytest.raises(ValueError, match="colorspace"):
        Y4MWriter(io.BytesIO(), 4, 4, csp="nope")


def test_png_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    from libplacebo_tpu.utils.y4m import read_png, write_png
    rng = np.random.default_rng(2)
    rgb = rng.random((3, 6, 5)).astype(np.float32)
    p = tmp_path / "t.png"
    write_png(p, rgb)
    back = read_png(p)
    assert back.shape == (3, 6, 5)
    assert np.abs(back - rgb).max() <= 0.5 / 255 + 1e-6
    # 16-bit grayscale
    g = rng.random((1, 4, 4)).astype(np.float32)
    write_png(p, g, depth=16)
    back = read_png(p)
    assert back.shape[0] == 1
    assert np.abs(back - g).max() <= 0.5 / 65535 + 1e-6


def test_y4m_colorrange_extension_tag():
    import io
    from libplacebo_tpu.utils.y4m import Y4MReader
    data, _ = _y4m_bytes(w=16, h=8, n=1)
    # splice the x264-style extension tag into the header line
    head, _, rest = data.partition(b"\n")
    data = head + b" XCOLORRANGE=FULL\n" + rest
    r = Y4MReader(io.BytesIO(data))
    assert "COLORRANGE=FULL" in r.info.extensions
    f = r.read_frame()
    assert f.repr.levels == ColorLevels.FULL


def test_plane_data_from_mask_and_comps():
    """Reference pl_plane_data_from_mask/from_comps (upload.c:47-94)."""
    # RGB565: r in bits 11-15, g in 5-10, b in 0-4
    size, pad, cmap = upload.plane_data_from_mask(
        [0xF800, 0x07E0, 0x001F])
    assert size == (5, 6, 5)
    assert pad == (0, 0, 0)
    assert cmap == (2, 1, 0)          # memory order: b, g, r
    # 10:10:10:2 (A2BGR10): a=bits 30-31, b=20-29, g=10-19, r=0-9
    size, pad, cmap = upload.plane_data_from_comps(
        [10, 10, 10, 2], [0, 10, 20, 30])
    assert size == (10, 10, 10, 2)
    assert cmap == (0, 1, 2, 3)
    import pytest
    with pytest.raises(ValueError):
        upload.plane_data_from_mask([0b1010])      # non-contiguous
    with pytest.raises(ValueError):
        upload.plane_data_from_comps([8, 8], [0, 4])   # overlap


def test_upload_packed_rgb565():
    # pack a 2x2 rgb565 image: red, green, blue, white
    words = np.array([[0xF800, 0x07E0], [0x001F, 0xFFFF]], np.uint16)
    size, pad, cmap = upload.plane_data_from_mask(
        [0xF800, 0x07E0, 0x001F])
    p = upload.upload_plane(upload.PlaneData(
        words, component_map=cmap, component_size=size,
        component_pad=pad))
    got = np.asarray(p.data)          # (3, 2, 2) in memory order b,g,r
    assert p.component_mapping == (2, 1, 0)
    np.testing.assert_allclose(got[2, 0, 0], 1.0)   # red pixel, r comp
    np.testing.assert_allclose(got[1, 0, 1], 1.0)   # green
    np.testing.assert_allclose(got[0, 1, 0], 1.0)   # blue
    np.testing.assert_allclose(got[:, 1, 1], 1.0)   # white: all comps
    assert got[1, 0, 0] == 0.0 and got[0, 0, 1] == 0.0


def test_plane_data_align():
    """Reference pl_plane_data_align (upload.c:96)."""
    # 12-bit components packed at the TOP of 16-bit words (xyz12):
    # pad 4 before each comp -> aligns to 16-bit samples w/ shift 4
    res = upload.plane_data_align((12, 12, 12), (4, 4, 4))
    assert res is not None
    size, pad, bits = res
    assert bits.sample_depth == 16 and bits.color_depth == 12
    assert bits.bit_shift == 4
    assert size == (16, 16, 16) and pad == (0, 0, 0)
    # already-aligned 8-bit comps are a no-op
    size, pad, bits = upload.plane_data_align((8, 8, 8), (0, 0, 0))
    assert bits == __import__(
        "libplacebo_tpu.core.colorspace", fromlist=["BitEncoding"]
    ).BitEncoding(8, 8, 0)
    # inconsistent component depths can't align
    assert upload.plane_data_align((5, 6, 5), (0, 0, 0)) is None


# ---------------------------------------------------------------------------
# Geometry helpers (core.common — reference src/common.c rect ops)
# ---------------------------------------------------------------------------

def test_rectf_stretch_xy_zoom_offset():
    from libplacebo_tpu.core.common import RectF
    rc = RectF(0, 0, 10, 20)
    st = rc.stretch_xy(2.0, 0.5)
    assert (st.x0, st.x1) == (-5.0, 15.0)
    assert (st.y0, st.y1) == (5.0, 15.0)
    zm = rc.zoom(2.0)
    assert (zm.x0, zm.x1, zm.y0, zm.y1) == (-5.0, 15.0, -10.0, 30.0)
    off = rc.offset(3.0, -2.0)
    assert (off.x0, off.y0, off.x1, off.y1) == (3.0, -2.0, 13.0, 18.0)
    # flipped axis inverts the offset direction (common.c:456)
    flipped = RectF(10, 0, 0, 20).offset(3.0, 0.0)
    assert (flipped.x0, flipped.x1) == (7.0, -3.0)


def test_rectf_aspect_copy_fit():
    from libplacebo_tpu.core.common import RectF
    dst = RectF(0, 0, 100, 100)
    src = RectF(0, 0, 200, 100)
    # aspect_copy(panscan=0): letterbox — shrink y to reach 2:1
    cp = dst.aspect_copy(src, 0.0)
    assert cp.w == pytest.approx(100.0)
    assert cp.h == pytest.approx(50.0)
    assert cp.midy() == pytest.approx(50.0)
    # aspect_fit with a smaller src: direct stretch to src's size
    small = RectF(0, 0, 50, 25)
    ft = dst.aspect_fit(small, 0.0)
    assert ft.w == pytest.approx(50.0)
    assert ft.h == pytest.approx(25.0)
    # aspect_fit with a larger src falls back to aspect_copy
    big = RectF(0, 0, 400, 200)
    ft2 = dst.aspect_fit(big, 0.0)
    assert ft2.aspect() == pytest.approx(2.0)
    assert ft2.w == pytest.approx(100.0)


def test_rectf_rotate():
    from libplacebo_tpu.core.common import RectF, Rotation
    rc = RectF(1, 2, 3, 4)
    assert rc.rotate(Rotation(0)) == rc
    r180 = rc.rotate(Rotation(2))
    assert (r180.x0, r180.y0, r180.x1, r180.y1) == (3, 4, 1, 2)
    r90 = rc.rotate(Rotation(1))
    # reference common.c:469: 90° maps (x0,y0,x1,y1) -> (y1, x0, y0, x1)
    assert (r90.x0, r90.y0, r90.x1, r90.y1) == (4, 1, 2, 3)
    # rotating four times returns the original
    out = rc
    for _ in range(4):
        out = out.rotate(Rotation(1))
    assert out == rc


def test_aspect_rotate():
    from libplacebo_tpu.core.common import Rotation, aspect_rotate
    assert aspect_rotate(2.0, Rotation(0)) == 2.0
    assert aspect_rotate(2.0, Rotation(1)) == pytest.approx(0.5)
    assert aspect_rotate(2.0, Rotation(2)) == 2.0
    assert aspect_rotate(0.0, Rotation(1)) == 0.0


def test_matrix2x2_transform2x2_ops():
    """Reference pl_matrix2x2_* / pl_transform2x2_* (common.c:252-397)."""
    import numpy as np
    from libplacebo_tpu.core.common import Matrix2x2, RectF, Transform2x2
    rot = Matrix2x2.rotation(np.pi / 2)
    np.testing.assert_allclose(rot.apply((1.0, 0.0)), [0.0, 1.0], atol=1e-12)
    assert rot.invert() == Matrix2x2.rotation(-np.pi / 2)
    assert rot @ rot.invert() == Matrix2x2.identity()
    sc = Matrix2x2.identity().scale(3.0)
    np.testing.assert_allclose(sc.apply((1.0, 2.0)), [3.0, 6.0])
    rc = rot.apply_rc(RectF(1, 2, 3, 4))
    np.testing.assert_allclose([rc.x0, rc.y0, rc.x1, rc.y1],
                               [-2.0, 1.0, -4.0, 3.0], atol=1e-12)

    t = Transform2x2(rot, (10.0, 0.0))
    np.testing.assert_allclose(t.apply((1.0, 0.0)), [10.0, 1.0], atol=1e-12)
    # invert really inverts
    np.testing.assert_allclose(t.invert().apply(t.apply((0.3, -0.7))),
                               [0.3, -0.7], atol=1e-12)
    # compose: inner first, then outer
    t2 = Transform2x2(Matrix2x2.identity(), (0.0, 5.0))
    np.testing.assert_allclose(t.compose(t2).apply((1.0, 0.0)),
                               t.apply(t2.apply((1.0, 0.0))), atol=1e-12)
    # scale scales both the matrix and the shift
    ts = t.scale(2.0)
    np.testing.assert_allclose(ts.apply((1.0, 0.0)), [20.0, 2.0], atol=1e-12)
    # bounds: axis-aligned bounding box of a rotated unit square
    t45 = Transform2x2(Matrix2x2.rotation(np.pi / 4), (0.0, 0.0))
    bb = t45.bounds(RectF(0, 0, 1, 1))
    s2 = np.sqrt(2.0)
    np.testing.assert_allclose([bb.x0, bb.y0, bb.x1, bb.y1],
                               [-s2 / 2, 0.0, s2 / 2, s2], atol=1e-12)


def test_matrix3x3_transform3x3_scale():
    import numpy as np
    from libplacebo_tpu.core.common import Matrix3x3, Transform3x3
    m = Matrix3x3(np.diag([1.0, 2.0, 3.0])).scale(2.0)
    np.testing.assert_allclose(np.diag(m.m), [2.0, 4.0, 6.0])
    t = Transform3x3(Matrix3x3.identity(), (1.0, 2.0, 3.0)).scale(0.5)
    np.testing.assert_allclose(t.c, [0.5, 1.0, 1.5])


def test_pixel_aspect_ratio_metadata():
    """Reference pl_frame.pixel_aspect_ratio (renderer.h:623, API 363):
    mapped from AVFrame.sample_aspect_ratio and consumed by stretching
    the crop (demos/plplay.c:405)."""
    import numpy as np
    from libplacebo_tpu.utils import interop
    from libplacebo_tpu.core.common import RectF
    av = {"format": "yuv420p",
          "data": [np.zeros((8, 8), np.uint8),
                   np.zeros((4, 4), np.uint8),
                   np.zeros((4, 4), np.uint8)],
          "sample_aspect_ratio": 4.0 / 3.0}
    f = interop.frame_from_avframe_like(av)
    assert f.pixel_aspect_ratio == pytest.approx(4.0 / 3.0)
    # applying it: a 4:3-PAR 640x360 crop displays as 853x360
    crop = RectF(0, 0, 640, 360).stretch_xy(
        max(1.0, f.pixel_aspect_ratio),
        max(1.0, 1.0 / f.pixel_aspect_ratio))
    assert crop.w == pytest.approx(640 * 4 / 3)
    assert crop.h == pytest.approx(360)
    # default: unknown
    av.pop("sample_aspect_ratio")
    assert interop.frame_from_avframe_like(av).pixel_aspect_ratio == 0.0


def test_p010_msb_alignment():
    """ffmpeg's p010le stores 10-bit samples in the TOP bits of each
    16-bit word; the interop must shift before UNORM normalization
    (the reference expresses this via pl_plane_data.shift)."""
    import numpy as np
    from libplacebo_tpu.utils.interop import frame_from_avframe_like
    # mid-gray 512 (10-bit) stored MSB-aligned: 512 << 6
    y = np.full((8, 8), 512 << 6, np.uint16)
    uv = np.full((4, 4, 2), 512 << 6, np.uint16)
    f = frame_from_avframe_like({"format": "p010le", "data": [y, uv]})
    got = float(np.asarray(f.planes[0].data)[0, 0, 0])
    assert abs(got - 512 / 1023.0) < 1e-6, got
    # 16-bit p016le needs no shift
    y16 = np.full((8, 8), 32768, np.uint16)
    uv16 = np.full((4, 4, 2), 32768, np.uint16)
    f16 = frame_from_avframe_like({"format": "p016le",
                                   "data": [y16, uv16]})
    got16 = float(np.asarray(f16.planes[0].data)[0, 0, 0])
    assert abs(got16 - 32768 / 65535.0) < 1e-6, got16


def test_gbrp_plane_order():
    """ffmpeg gbrp planes are ordered G, B, R (pixdesc); a pure-red
    gbrp frame must decode to red, not blue."""
    import numpy as np
    from libplacebo_tpu.utils.interop import frame_from_avframe_like
    g = np.zeros((4, 4), np.uint8)
    b = np.zeros((4, 4), np.uint8)
    r = np.full((4, 4), 255, np.uint8)
    f = frame_from_avframe_like({"format": "gbrp", "data": [g, b, r]})
    # merge plane components by canonical id
    by_comp = {}
    for p in f.planes:
        for ci, comp in enumerate(p.component_mapping):
            by_comp[comp] = np.asarray(p.data)[ci]
    assert by_comp[0].max() == 1.0          # R
    assert by_comp[1].max() == 0.0          # G
    assert by_comp[2].max() == 0.0          # B


def test_avcol_mapping_completeness():
    """Enum-string coverage mirrors the reference's libav mapping
    (libav_internal.h:54-219): the EOTF!=OETF family maps to BT.1886,
    bt2020-10/12 included; smpte428 maps to ST428/CIE_1931."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                ColorSystem, ColorTransfer)
    from libplacebo_tpu.utils.interop import (_AVCOL_PRI, _AVCOL_SPC,
                                              _AVCOL_TRC)
    assert _AVCOL_TRC["bt2020-10"] == ColorTransfer.BT_1886
    assert _AVCOL_TRC["smpte428"] == ColorTransfer.ST428
    assert _AVCOL_TRC["iec61966-2-4"] == ColorTransfer.BT_1886
    assert _AVCOL_PRI["smpte428"] == ColorPrimaries.CIE_1931
    assert _AVCOL_PRI["jedec-p22"] == ColorPrimaries.EBU_3213
    assert _AVCOL_SPC["ycgco-re"] == ColorSystem.YCGCO_RE
    assert _AVCOL_SPC["bt2020ncl"] == ColorSystem.BT_2020_NC


def test_avframe_export_canonical_names():
    """Export picks the canonical av name, not an alias: BT.1886 ->
    'bt709' (not one of the EOTF!=OETF aliases); PAR roundtrips."""
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    import numpy as np
    f = interop.frame_from_avframe_like(_yuv_av(
        color_trc="bt2020-10", colorspace="bt2020ncl",
        sample_aspect_ratio=1.5))
    out = interop.frame_to_avframe_like(f)
    assert out["color_trc"] == "bt709"          # canonical BT_1886 name
    assert out["colorspace"] == "bt2020nc"
    assert out["sample_aspect_ratio"] == 1.5


def test_test_pixfmt():
    """Reference pl_test_pixfmt: supported-layout probing."""
    assert interop.test_pixfmt("yuv420p")
    assert interop.test_pixfmt("p010le")
    assert not interop.test_pixfmt("vulkan")
    assert not interop.test_pixfmt("weird")


# ---------------------------------------------------------------------------
# Device-side normalization (r4): raw integers upload as-is and the
# UNORM normalize / packed unpack / relayout run on device.  Values
# must be BIT-IDENTICAL to the host-side numpy path (same float32 ops).
# ---------------------------------------------------------------------------

def _host_oracle_planar(arr, comp_map, bit_depth=0, bit_shift=0):
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    if np.issubdtype(arr.dtype, np.integer):
        depth = bit_depth or arr.dtype.itemsize * 8
        if bit_shift:
            arr = arr >> bit_shift
        farr = arr.astype(np.float32) * (1.0 / float(2 ** depth - 1))
    else:
        farr = arr.astype(np.float32)
    return np.moveaxis(farr, -1, 0)


@pytest.mark.parametrize("dtype,depth,shift", [
    (np.uint8, 0, 0), (np.uint16, 10, 0), (np.uint16, 10, 6),
    (np.uint16, 12, 4), (np.int32, 16, 0)])
def test_device_norm_matches_host_bitexact(dtype, depth, shift):
    rng = np.random.default_rng(3)
    hi = 2 ** ((depth or np.dtype(dtype).itemsize * 8) + shift) - 1
    arr = rng.integers(0, hi + 1, (7, 11, 3)).astype(dtype)
    p = upload.upload_plane(upload.PlaneData(
        arr, (0, 1, 2), bit_depth=depth, bit_shift=shift))
    oracle = _host_oracle_planar(arr, (0, 1, 2), depth, shift)
    np.testing.assert_array_equal(np.asarray(p.data), oracle)


def test_device_norm_float_passthrough_bitexact():
    rng = np.random.default_rng(4)
    arr = rng.random((5, 9, 2)).astype(np.float32)
    p = upload.upload_plane(upload.PlaneData(arr, (0, 1)))
    np.testing.assert_array_equal(
        np.asarray(p.data), np.moveaxis(arr, -1, 0))


def test_device_unpack_words_matches_host_bitexact():
    # 10:10:10:2 in uint32 words and rgb565 in uint16 words
    rng = np.random.default_rng(5)
    for masks, dtype in ((((1 << 10) - 1, ((1 << 10) - 1) << 10,
                           ((1 << 10) - 1) << 20, 0x3 << 30), np.uint32),
                         ((0x1F, 0x7E0, 0xF800), np.uint16)):
        size, pad, cmap = upload.plane_data_from_mask(masks)
        words = rng.integers(0, np.iinfo(dtype).max,
                             (6, 10), dtype=np.uint64).astype(dtype)
        p = upload.upload_plane(upload.PlaneData(
            words, cmap, component_size=size, component_pad=pad))
        # host oracle: the pre-r4 uint64 unpack
        w64 = words.astype(np.uint64)
        offset = 0
        comps = []
        for sz, pd_ in zip(size, pad):
            offset += pd_
            c = (w64 >> np.uint64(offset)) & np.uint64((1 << sz) - 1)
            comps.append(c.astype(np.float32) / float((1 << sz) - 1))
            offset += sz
        np.testing.assert_array_equal(np.asarray(p.data),
                                      np.stack(comps, axis=0))


def test_frame_from_yuv420p_device_norm_bitexact():
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    rng = np.random.default_rng(6)
    y = rng.integers(0, 1024, (8, 8)).astype(np.uint16)
    u = rng.integers(0, 1024, (4, 4)).astype(np.uint16)
    v = rng.integers(0, 1024, (4, 4)).astype(np.uint16)
    f = frame_from_yuv420p(y, u, v, bit_depth=10)
    np.testing.assert_array_equal(
        np.asarray(f.planes[0].data)[0],
        y.astype(np.float32) / float(2 ** 10 - 1))
    np.testing.assert_array_equal(
        np.asarray(f.planes[1].data)[0],
        u.astype(np.float32) / float(2 ** 10 - 1))


def test_frame_from_yuv420p_device_norm_optout(monkeypatch):
    """LPTPU_DEVICE_NORM=0 must cover BOTH ingestion entry points
    (ADVICE r4: frame_from_yuv420p ignored the flag): with the opt-out
    the host path runs (the device-norm jit is never called) and the
    values are bit-identical to the device path."""
    from libplacebo_tpu.render import frame as frame_mod
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.utils import upload

    rng = np.random.default_rng(7)
    y = rng.integers(16, 236, (8, 12), dtype=np.uint8)
    u = rng.integers(16, 241, (4, 6), dtype=np.uint8)
    v = rng.integers(16, 241, (4, 6), dtype=np.uint8)
    f_dev = frame_from_yuv420p(y, u, v)

    monkeypatch.setattr(upload, "_DEVICE_NORM", False)

    def _boom(*a, **k):
        raise AssertionError("device-norm path taken despite opt-out")

    monkeypatch.setattr(frame_mod, "_dev_norm_gray", _boom)
    f_host = frame_from_yuv420p(y, u, v)
    for pd, ph in zip(f_dev.planes, f_host.planes):
        np.testing.assert_array_equal(np.asarray(pd.data),
                                      np.asarray(ph.data))
