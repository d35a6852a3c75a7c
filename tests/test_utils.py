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
    av = dict(format="p010le",
              data=[np.full((8, 8), 512, np.uint16),
                    np.full((4, 4, 2), 512, np.uint16)])
    f = interop.frame_from_avframe_like(av)
    # 10-bit normalization
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
