"""Dolby Vision RPU bitstream parser — round-trip + mapping tests
(reference: utils/dolbyvision.c via libdovi; bitstream layout as in
FFmpeg's dovi_rpu.c)."""
import numpy as np
import pytest

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
