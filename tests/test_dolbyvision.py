"""Dolby Vision RPU bitstream parser — round-trip + mapping tests
(reference: utils/dolbyvision.c via libdovi; bitstream layout as in
FFmpeg's dovi_rpu.c)."""
import numpy as np
import pytest

from libplacebo_tpu.utils import dolbyvision as dovi
from libplacebo_tpu.utils.dolbyvision import (DoviRpu, RpuCurve,
                                              RpuError, RpuExtBlock,
                                              hdr_metadata_from_rpu,
                                              parse_rpu, rpu_to_dovi,
                                              write_rpu)


def _poly_curve(denom):
    # identity-ish: p(x) = 0.05 + 0.9 x over one piece
    return RpuCurve(
        num_pivots=2, pivots=(0, 1023),
        mapping_idc=(0,), poly_order=(2,),
        poly_coef=((int(0.05 * (1 << denom)), int(0.9 * (1 << denom)),
                    int(0.02 * (1 << denom))),),
        mmr_order=(0,), mmr_constant=(0,), mmr_coef=((),))


def _mmr_curve(denom):
    rows = tuple(tuple(int((0.1 * (j + 1) / (k + 1)) * (1 << denom))
                       for k in range(7)) for j in range(2))
    return RpuCurve(
        num_pivots=2, pivots=(0, 1023),
        mapping_idc=(1,), poly_order=(0,), poly_coef=((),),
        mmr_order=(2,), mmr_constant=(int(0.3 * (1 << denom)),),
        mmr_coef=(rows,))


def _sample_rpu(denom=23, with_dm=True):
    curves = (_poly_curve(denom), _mmr_curve(denom), _poly_curve(denom))
    blocks = ()
    if with_dm:
        blocks = (RpuExtBlock(level=1, min_pq=62, max_pq=3210, avg_pq=1024),
                  RpuExtBlock(level=2, target_max_pq=2081,
                              trim_slope=2013, trim_offset=2120,
                              trim_power=1900, ms_weight=-1000),
                  RpuExtBlock(level=6, max_luminance=1000,
                              min_luminance=1, max_cll=800, max_fall=300))
    return DoviRpu(coef_log2_denom=denom, curves=curves,
                   dm_metadata_present=with_dm, ext_blocks=blocks,
                   source_min_pq=62, source_max_pq=3696)


def test_rpu_roundtrip():
    rpu = _sample_rpu()
    buf = write_rpu(rpu)
    out = parse_rpu(buf)
    assert out.coef_log2_denom == rpu.coef_log2_denom
    assert out.bl_bit_depth == rpu.bl_bit_depth
    for a, b in zip(out.curves, rpu.curves):
        assert a.num_pivots == b.num_pivots
        assert a.pivots == b.pivots
        assert a.mapping_idc == b.mapping_idc
        assert a.poly_coef == b.poly_coef
        assert a.mmr_constant == b.mmr_constant
        assert a.mmr_coef == b.mmr_coef
    assert out.source_max_pq == 3696
    levels = [blk.level for blk in out.ext_blocks]
    assert levels == [1, 2, 6]
    assert out.ext_blocks[0].max_pq == 3210
    assert out.ext_blocks[1].ms_weight == -1000
    assert out.ext_blocks[2].max_cll == 800


def test_rpu_roundtrip_no_dm():
    rpu = _sample_rpu(with_dm=False)
    out = parse_rpu(write_rpu(rpu))
    assert not out.dm_metadata_present
    assert out.ext_blocks == ()


def test_rpu_emulation_prevention():
    """Parsing tolerates NAL emulation-prevention bytes and the unspec-62
    NAL header."""
    rpu = _sample_rpu()
    raw = write_rpu(rpu)
    # re-insert emulation prevention like an encoder would
    ebsp = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            ebsp.append(3)
            zeros = 0
        ebsp.append(b)
        zeros = zeros + 1 if b == 0 else 0
    nal = bytes([62 << 1, 1]) + bytes(ebsp)
    out = parse_rpu(nal)
    assert out.curves[0].poly_coef == rpu.curves[0].poly_coef


def test_rpu_to_dovi_scaling():
    denom = 23
    rpu = _sample_rpu(denom)
    dovi = rpu_to_dovi(rpu)
    # pl_map_dovi_metadata scalings (libav_internal.h:896-945)
    c0 = dovi.comp[0]
    np.testing.assert_allclose(c0["poly_coeffs"][0],
                               (0.05, 0.9, 0.02), atol=2e-7)
    np.testing.assert_allclose(c0["pivots"], (0.0, 1.0), atol=1e-6)
    c1 = dovi.comp[1]
    assert c1["method"] == (1,)
    np.testing.assert_allclose(c1["mmr_constant"][0], 0.3, atol=2e-7)
    assert np.asarray(c1["mmr_coeffs"][0]).shape == (2, 7)
    # default color matrices (BT.2020 YCbCr -> RGB at /8192)
    np.testing.assert_allclose(dovi.nonlinear[0], (1.0, 0.0, 12900 / 8192),
                               atol=1e-6)
    np.testing.assert_allclose(dovi.nonlinear_offset, (0.0, 0.5, 0.5),
                               atol=1e-6)


def test_hdr_metadata_from_rpu():
    from libplacebo_tpu.core.colorspace import HdrMetadata
    rpu = _sample_rpu()
    hdr = hdr_metadata_from_rpu(HdrMetadata(), write_rpu(rpu))
    assert abs(hdr.max_pq_y - 3210 / 4095) < 1e-6
    assert abs(hdr.avg_pq_y - 1024 / 4095) < 1e-6
    # garbage in -> unchanged metadata, no crash
    hdr2 = hdr_metadata_from_rpu(HdrMetadata(), b"\x00\x01\x02")
    assert hdr2 == HdrMetadata()


def test_rpu_renders_end_to_end():
    """A parsed RPU drives the renderer's Dolby Vision path."""
    import jax.numpy as jnp
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorPrimaries, ColorRepr,
                                                ColorSpace, ColorSystem,
                                                ColorTransfer, CSP_SRGB)
    from libplacebo_tpu.render.frame import Frame, Plane
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    dovi = rpu_to_dovi(parse_rpu(write_rpu(_sample_rpu())))
    rng = np.random.default_rng(3)
    rgb = rng.random((3, 16, 24)).astype(np.float32) * 0.6
    frame = Frame(
        planes=[Plane(data=jnp.asarray(rgb), component_mapping=(0, 1, 2))],
        repr=ColorRepr(sys=ColorSystem.DOLBYVISION,
                       levels=ColorLevels.FULL,
                       bits=BitEncoding(12, 12, 0), dovi=dovi),
        color=ColorSpace(ColorPrimaries.BT_2020, ColorTransfer.PQ))
    out = np.asarray(Renderer()._render_once(
        frame, Target(w=24, h=16, color=CSP_SRGB),
        RenderParams(peak_detect=None, dither=None)))
    assert np.all(np.isfinite(out))
    assert out.min() >= 0 and out.max() <= 1


def test_rpu_profile7_nlq_roundtrip():
    """Dual-layer profile-7 RPUs (FEL/MEL): the NLQ header + rpu_data_nlq
    payload parse and round-trip; the base-layer curves still map
    (reference never processes the EL, utils/dolbyvision.c)."""
    from libplacebo_tpu.utils.dolbyvision import RpuNlq
    denom = 23
    rpu = _sample_rpu(denom)
    rpu.vdr_rpu_profile = 0
    rpu.el_bit_depth = 10
    rpu.disable_residual_flag = False
    rpu.nlq = RpuNlq(
        method_idc=0, pivots=(0, 1023),
        nlq_offset=(512, 510, 508),
        vdr_in_max=(1 << denom, 1 << (denom - 1), 3 << (denom - 2)),
        dz_slope=(int(2.5 * (1 << denom)), 1 << denom, 1 << denom),
        dz_threshold=(int(0.01 * (1 << denom)), 0, 0))
    out = parse_rpu(write_rpu(rpu))
    assert out.disable_residual_flag is False
    assert out.nlq is not None
    assert out.nlq.method_idc == 0
    assert out.nlq.pivots == (0, 1023)
    assert out.nlq.nlq_offset == rpu.nlq.nlq_offset
    assert out.nlq.vdr_in_max == rpu.nlq.vdr_in_max
    assert out.nlq.dz_slope == rpu.nlq.dz_slope
    assert out.nlq.dz_threshold == rpu.nlq.dz_threshold
    # base-layer reshaping data survives alongside the EL fields
    assert out.curves[0].poly_coef == rpu.curves[0].poly_coef
    dovi = rpu_to_dovi(out)
    assert abs(dovi.comp[0]["poly_coeffs"][0][1] - 0.9) < 1e-5
    # method 1 (MU_LAW-style, no deadzone payload) also round-trips
    rpu.nlq = RpuNlq(method_idc=1, pivots=(0, 1023),
                     nlq_offset=(1, 2, 3),
                     vdr_in_max=(1 << denom,) * 3)
    out2 = parse_rpu(write_rpu(rpu))
    assert out2.nlq.method_idc == 1
    assert out2.nlq.nlq_offset == (1, 2, 3)
    assert out2.nlq.dz_slope == (0, 0, 0)


def test_rpu_ext_blocks_cmv4():
    """Extension-block levels 3 (L1 offsets), 5 (active area) and 254
    (CM v4 marker) parse and round-trip; unknown levels are skipped by
    length."""
    rpu = _sample_rpu()
    rpu.ext_blocks = rpu.ext_blocks + (
        RpuExtBlock(level=3, min_pq_offset=2000, max_pq_offset=2100,
                    avg_pq_offset=2048),
        RpuExtBlock(level=5, active_area=(10, 20, 30, 40)),
        RpuExtBlock(level=254, dm_mode=1, dm_version_index=2),
    )
    out = parse_rpu(write_rpu(rpu))
    levels = [blk.level for blk in out.ext_blocks]
    assert levels == [1, 2, 6, 3, 5, 254]
    l3 = out.ext_blocks[3]
    assert (l3.min_pq_offset, l3.max_pq_offset) == (2000, 2100)
    assert out.ext_blocks[4].active_area == (10, 20, 30, 40)
    assert out.ext_blocks[5].dm_mode == 1
    # L1 extraction still works with the extra blocks present
    from libplacebo_tpu.core.colorspace import HdrMetadata
    hdr = hdr_metadata_from_rpu(HdrMetadata(), write_rpu(rpu))
    assert abs(hdr.max_pq_y - 3210 / 4095) < 1e-6


# ---------------------------------------------------------------------------
# Non-self-referential fixtures: tests/golden/dovi/*.bin are encoded by
# an INDEPENDENT second implementation of the RPU syntax
# (tools/golden/gen_dovi_rpu_fixtures.py — byte-cursor writer transcribed
# from the field order FFmpeg's dovi_rpudec.c implements), wrapped like
# real captures: unspec-62 NAL header, emulation-prevention bytes, and
# a CRC32+0x80 trailer the parser must tolerate. The JSON beside each
# .bin is the encoder's input — every field below is pinned against it.
# ---------------------------------------------------------------------------

import json
import os

_DOVI_DIR = os.path.join(os.path.dirname(__file__), "golden", "dovi")


def _load(name):
    with open(os.path.join(_DOVI_DIR, f"{name}.bin"), "rb") as f:
        buf = f.read()
    with open(os.path.join(_DOVI_DIR, f"{name}.json")) as f:
        cfg = json.load(f)
    return buf, cfg


def _check_fields(rpu, cfg):
    assert rpu.vdr_rpu_profile == cfg["vdr_rpu_profile"]
    assert rpu.vdr_rpu_level == cfg["vdr_rpu_level"]
    assert rpu.coef_log2_denom == cfg["coef_log2_denom"]
    assert rpu.vdr_rpu_normalized_idc == cfg["vdr_rpu_normalized_idc"]
    assert rpu.bl_video_full_range_flag == cfg["bl_video_full_range_flag"]
    assert rpu.bl_bit_depth == cfg["bl_bit_depth"]
    assert rpu.el_bit_depth == cfg["el_bit_depth"]
    assert rpu.vdr_bit_depth == cfg["vdr_bit_depth"]
    assert rpu.disable_residual_flag == cfg["disable_residual_flag"]
    assert rpu.dm_metadata_present == cfg["dm_metadata_present"]
    for cur, exp in zip(rpu.curves, cfg["curves"]):
        assert list(cur.pivots) == exp["pivots"]
        assert cur.num_pivots == len(exp["pivots"])
        for i, piece in enumerate(exp["pieces"]):
            if piece["kind"] == "poly":
                assert cur.mapping_idc[i] == 0
                assert cur.poly_order[i] == len(piece["coef"]) - 1
                assert list(cur.poly_coef[i]) == piece["coef"]
            else:
                assert cur.mapping_idc[i] == 1
                assert cur.mmr_order[i] == len(piece["rows"])
                assert cur.mmr_constant[i] == piece["constant"]
                assert [list(r) for r in cur.mmr_coef[i]] == piece["rows"]
    dm = cfg["dm"]
    assert list(rpu.ycc_to_rgb_matrix) == dm["ycc_to_rgb_matrix"]
    assert list(rpu.ycc_to_rgb_offset) == dm["ycc_to_rgb_offset"]
    assert list(rpu.rgb_to_lms_matrix) == dm["rgb_to_lms_matrix"]
    assert rpu.signal_eotf == dm["signal_eotf"]
    assert rpu.signal_bit_depth == dm["signal_bit_depth"]
    assert rpu.signal_color_space == dm["signal_color_space"]
    assert rpu.signal_full_range_flag == dm["signal_full_range_flag"]
    assert rpu.source_min_pq == dm["source_min_pq"]
    assert rpu.source_max_pq == dm["source_max_pq"]
    assert rpu.source_diagonal == dm["source_diagonal"]
    assert rpu.scene_refresh_flag == dm["scene_refresh_flag"]
    assert len(rpu.ext_blocks) == len(dm["ext_blocks"])
    for blk, exp in zip(rpu.ext_blocks, dm["ext_blocks"]):
        assert blk.level == exp["level"]
        for k, v in exp.items():
            if k == "level":
                continue
            got = getattr(blk, k)
            got = list(got) if isinstance(got, tuple) else got
            assert got == v, (blk.level, k, got, v)


def test_fixture_profile5_iptpqc2():
    buf, cfg = _load("profile5")
    rpu = dovi.parse_rpu(buf)
    _check_fields(rpu, cfg)
    assert rpu.nlq is None
    assert rpu.signal_color_space == 2          # IPT carriage
    # chroma curves are MMR — the defining feature of profile 5
    assert rpu.curves[1].mapping_idc == (1,)
    assert rpu.curves[2].mapping_idc == (1,)
    assert rpu.curves[2].mmr_order == (2,)


def test_fixture_profile7_fel_nlq():
    buf, cfg = _load("profile7")
    rpu = dovi.parse_rpu(buf)
    _check_fields(rpu, cfg)
    assert rpu.nlq is not None
    exp = cfg["nlq"]
    assert rpu.nlq.method_idc == exp["method_idc"]
    assert list(rpu.nlq.pivots) == exp["pivots"]
    assert list(rpu.nlq.nlq_offset) == exp["nlq_offset"]
    assert list(rpu.nlq.vdr_in_max) == exp["vdr_in_max"]
    assert list(rpu.nlq.dz_slope) == exp["dz_slope"]
    assert list(rpu.nlq.dz_threshold) == exp["dz_threshold"]


def test_fixture_profile81_cmv4():
    buf, cfg = _load("profile81")
    rpu = dovi.parse_rpu(buf)
    _check_fields(rpu, cfg)
    assert rpu.nlq is None
    # 4-piece luma reshaping curve
    assert rpu.curves[0].num_pivots == 5
    assert all(i == 0 for i in rpu.curves[0].mapping_idc)


def test_fixture_rpu_to_dovi_scaling():
    """pl_map_dovi_metadata scaling on the independently-encoded
    profile-5 fixture: fixed-point -> float with the exact divisors."""
    buf, cfg = _load("profile5")
    md = dovi.rpu_to_dovi(dovi.parse_rpu(buf))
    D = cfg["coef_log2_denom"]
    # luma poly [0, 1.0]
    np.testing.assert_allclose(md.comp[0]["poly_coeffs"][0],
                               (0.0, 1.0, 0.0), atol=2 ** -D)
    # chroma 1 MMR constant 0.5, first row
    np.testing.assert_allclose(md.comp[1]["mmr_constant"][0], 0.5,
                               atol=2 ** -D)
    np.testing.assert_allclose(
        md.comp[1]["mmr_coeffs"][0][0],
        (0.1, -0.2, 0.05, 0.3, -0.01, 0.002, -0.004), atol=2 ** -D)
    # pivots normalized by 2^bl_bit_depth - 1
    np.testing.assert_allclose(md.comp[0]["pivots"], (0.0, 1.0))
    # matrices by their fixed denominators
    np.testing.assert_allclose(md.nonlinear[0], (1.0, 0.0, 12900 / 8192))
    np.testing.assert_allclose(md.nonlinear_offset,
                               (0.0, 0.5, 0.5), atol=1e-7)


def test_fixture_hdr_metadata_l1():
    """L1 brightness from the profile-8.1 fixture maps per
    pl_hdr_metadata_from_dovi_rpu (values / 4095)."""
    from libplacebo_tpu.core.colorspace import HdrMetadata
    buf, cfg = _load("profile81")
    hdr = dovi.hdr_metadata_from_rpu(HdrMetadata(), buf)
    l1 = cfg["dm"]["ext_blocks"][0]
    assert abs(hdr.max_pq_y - l1["max_pq"] / 4095.0) < 1e-9
    assert abs(hdr.avg_pq_y - l1["avg_pq"] / 4095.0) < 1e-9


def test_fixture_emulation_and_trailer():
    """The fixtures are wrapped like captures: the NAL-layer emulation
    prevention bytes and the CRC32+0x80 trailer must not perturb
    parsing (byte-identical fields vs the unwrapped rbsp)."""
    buf, _ = _load("profile7")
    # the wrapper really did insert emulation bytes
    assert b"\x00\x00\x03" in buf
    rpu_wrapped = dovi.parse_rpu(buf)
    # hand-unwrap: strip NAL header + trailer, keep EBSP (parse_rpu
    # strips emulation itself)
    rpu_body = dovi.parse_rpu(buf[2:])
    assert rpu_wrapped == rpu_body
