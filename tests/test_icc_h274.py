"""ICC parsing + H.274 grain tests."""
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core import icc as icc_mod
from libplacebo_tpu.core.film_grain import FilmGrainData, H274GrainData
from libplacebo_tpu.ops import film_grain_h274 as h274


# --- synthesize a minimal sRGB-like matrix/TRC profile -----------------

def _make_profile(gamma=2.2):
    def xyz_tag(v):
        return b"XYZ " + b"\0" * 4 + struct.pack(
            ">3i", *(int(round(x * 65536)) for x in v))

    def curv_gamma(g):
        return b"curv" + b"\0" * 4 + struct.pack(">I", 1) + \
            struct.pack(">H", int(round(g * 256)))

    # sRGB primaries matrix to D50 (approx values from the sRGB spec)
    tags = {
        b"rXYZ": xyz_tag((0.4360, 0.2225, 0.0139)),
        b"gXYZ": xyz_tag((0.3851, 0.7169, 0.0971)),
        b"bXYZ": xyz_tag((0.1431, 0.0606, 0.7139)),
        b"rTRC": curv_gamma(gamma),
        b"gTRC": curv_gamma(gamma),
        b"bTRC": curv_gamma(gamma),
        b"wtpt": xyz_tag((0.9642, 1.0, 0.8249)),
    }
    header = bytearray(128)
    header[8] = 4
    header[16:20] = b"RGB "
    header[20:24] = b"XYZ "
    body = struct.pack(">I", len(tags))
    offset = 132 + 12 * len(tags)
    table = b""
    blob = b""
    for sig, data in tags.items():
        table += struct.pack(">4sII", sig, offset, len(data))
        blob += data
        offset += len(data)
    out = bytes(header) + body + table + blob
    return struct.pack(">I", len(out)) + out[4:]


def test_parse_profile():
    prof = icc_mod.parse_icc(_make_profile())
    assert prof.color_space == "RGB"
    assert prof.rgb2xyz is not None
    assert len(prof.trc) == 3
    assert prof.trc[0].kind == "gamma"
    assert prof.trc[0].gamma == pytest.approx(2.2, abs=0.01)


def test_profile_primaries_close_to_srgb():
    prof = icc_mod.parse_icc(_make_profile())
    prim = prof.containing_primaries()
    # matrix columns adapted from D50 should land near BT.709 primaries
    assert abs(prim.red.x - 0.64) < 0.02
    assert abs(prim.green.y - 0.60) < 0.02


def test_profile_decode_encode_roundtrip():
    prof = icc_mod.parse_icc(_make_profile())
    rng = np.random.default_rng(0)
    rgb = rng.random((32, 3))
    lin = prof.decode(rgb)
    back = prof.encode(lin)
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_parse_errors():
    with pytest.raises(icc_mod.IccError):
        icc_mod.parse_icc(b"tiny")
    blob = bytearray(_make_profile())
    blob[16:20] = b"CMYK"
    with pytest.raises(icc_mod.IccError):
        icc_mod.parse_icc(bytes(blob))


# --- H.274 grain -------------------------------------------------------

H274 = H274GrainData(
    model_id=0, blending_mode_id=0, log2_scale_factor=2,
    component_model_present=(True, False, False),
    num_intensity_intervals=(2, 0, 0), num_model_values=(3, 0, 0),
    intensity_interval_lower_bound=((0, 128), (), ()),
    intensity_interval_upper_bound=((127, 255), (), ()),
    comp_model_value=(((100, 8, 8), (60, 10, 6)), (), ()))
DATA = FilmGrainData(type="h274", seed=1234, h274=H274)


def test_h274_db_statistics():
    db = h274.generate_grain_db()
    assert db.shape == (13 * 64, 13 * 64)
    assert abs(float(db.mean())) < 0.01
    assert 0.05 < float(db.std()) < 0.3
    assert float(np.abs(db).max()) <= 0.5


def test_h274_db_deterministic():
    a = h274.generate_grain_db()
    b = h274._generate_slice(3, 5)
    c = h274._generate_slice(3, 5)
    np.testing.assert_array_equal(b, c)


def test_h274_apply():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 64, 96)).astype(np.float32))
    out = np.asarray(h274.apply_h274_grain(img, DATA, (0,)))
    diff = out - np.asarray(img)
    assert abs(diff.mean()) < 0.002
    assert diff.std() > 1e-3
    out2 = np.asarray(h274.apply_h274_grain(
        img, FilmGrainData(type="h274", seed=9, h274=H274), (0,)))
    assert not np.array_equal(out, out2)


def test_h274_in_renderer():
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import Renderer, Target
    rng = np.random.default_rng(1)
    y = (rng.random((48, 64)) * 219 + 16).astype(np.uint8)
    u = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    v = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    f = frame_from_yuv420p(y, u, v)
    f.film_grain = DATA
    r = Renderer()
    out_g = np.asarray(r.render(f, Target(w=64, h=48)))
    f2 = frame_from_yuv420p(y, u, v)
    out_p = np.asarray(r.render(f2, Target(w=64, h=48)))
    assert not np.array_equal(out_g, out_p)
    assert np.all(np.isfinite(out_g))


def test_icc_device_encode_roundtrip():
    """Device profile encode matches the host curve inverse."""
    import jax.numpy as jnp
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                primaries_get)
    from libplacebo_tpu.ops import icc as ops_icc
    prof = icc_mod.parse_icc(_make_profile(gamma=2.2))
    rng = np.random.default_rng(3)
    lin = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32))
    sig = ops_icc.encode_profile(lin, prof,
                                 primaries_get(ColorPrimaries.BT_709))
    back = ops_icc.decode_profile(sig, prof,
                                  primaries_get(ColorPrimaries.BT_709))
    np.testing.assert_allclose(np.asarray(back), np.asarray(lin),
                               atol=5e-3)


def test_icc_in_render_target():
    """Rendering to an ICC target encodes via the profile TRC: a gamma
    2.8 profile produces brighter signal values than sRGB for mid grays."""
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.render.renderer import (Renderer, RenderParams,
                                                Target)
    from libplacebo_tpu.core.colorspace import CSP_SRGB, ColorSpace, \
        ColorPrimaries, ColorTransfer
    prof = icc_mod.parse_icc(_make_profile(gamma=2.8))
    rng = np.random.default_rng(4)
    rgb = np.full((16, 16, 3), 0.5, np.float32)
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    tgt_icc = Target(w=16, h=16, color=ColorSpace(
        ColorPrimaries.BT_709, ColorTransfer.GAMMA22), icc=prof)
    p = RenderParams(peak_detect=None, dither=None)
    out = np.asarray(Renderer().render(frame, tgt_icc, p))
    # linear of sRGB 0.5 ~ 0.214; gamma-2.8-encoded ~ 0.214^(1/2.8) ~ 0.577
    assert abs(out.mean() - 0.214 ** (1 / 2.8)) < 0.02
