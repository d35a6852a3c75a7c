"""Device color ops — mirrors the reference's color shader tests in
pl_shader_tests (src/tests/gpu_tests.c:331)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                            ColorPrimaries, ColorRepr,
                                            ColorSpace, ColorSystem,
                                            ColorTransfer, CSP_BT2100_PQ,
                                            CSP_SRGB)
from libplacebo_tpu.ops import color as C
from libplacebo_tpu.ops.color import SigmoidParams
from libplacebo_tpu.ops import dithering as D


def _img(vals):
    """(N,3) colors -> (3, 1, N) image."""
    a = np.asarray(vals, dtype=np.float32).T[:, None, :]
    return jnp.asarray(a)


def _colors(img):
    return np.asarray(img)[:, 0, :].T


def test_decode_bt709_black_white():
    repr = ColorRepr(sys=ColorSystem.BT_709, levels=ColorLevels.LIMITED,
                     bits=BitEncoding(8, 8, 0))
    img = _img([[16 / 255, 128 / 255, 128 / 255],
                [235 / 255, 128 / 255, 128 / 255]])
    out = _colors(C.decode_color(img, repr))
    np.testing.assert_allclose(out[0], [0, 0, 0], atol=1e-5)
    np.testing.assert_allclose(out[1], [1, 1, 1], atol=1e-5)


def test_decode_encode_roundtrip():
    repr = ColorRepr(sys=ColorSystem.BT_709, levels=ColorLevels.LIMITED,
                     bits=BitEncoding(10, 10, 0))
    rng = np.random.default_rng(0)
    rgb = rng.random((32, 3))
    enc = C.encode_color(_img(rgb), repr)
    dec = C.decode_color(enc, repr)
    np.testing.assert_allclose(_colors(dec), rgb, atol=1e-5)


def test_linearize_delinearize_roundtrip():
    for csp in (CSP_SRGB, CSP_BT2100_PQ,
                ColorSpace(ColorPrimaries.BT_709, ColorTransfer.BT_1886),
                ColorSpace(ColorPrimaries.BT_2020, ColorTransfer.HLG)):
        rng = np.random.default_rng(1)
        rgb = rng.random((64, 3)).astype(np.float32)
        img = _img(rgb)
        lin = C.linearize(img, csp)
        back = C.delinearize(lin, csp)
        np.testing.assert_allclose(_colors(back), rgb, atol=2e-3,
                                   err_msg=str(csp.transfer))


def test_linearize_bt1886_black_lift():
    """BT.1886 maps signal 0 to the display black level, not 0."""
    csp = ColorSpace(ColorPrimaries.BT_709, ColorTransfer.BT_1886)
    lo, hi = C.nominal_luma_norm(csp)
    img = _img([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    out = _colors(C.linearize(img, csp))
    np.testing.assert_allclose(out[0], lo, rtol=1e-4)
    np.testing.assert_allclose(out[1], hi, rtol=1e-4)


def test_linearize_pq_absolute():
    csp = CSP_BT2100_PQ
    img = _img([[1.0, 1.0, 1.0]])
    out = _colors(C.linearize(img, csp))
    np.testing.assert_allclose(out[0], 10000.0 / 203.0, rtol=1e-4)


def test_sigmoid_roundtrip():
    rng = np.random.default_rng(2)
    vals = rng.random((64, 3)).astype(np.float32)
    img = _img(vals)
    sig = SigmoidParams()
    out = C.desigmoidize(C.sigmoidize(img, sig), sig)
    np.testing.assert_allclose(_colors(out), vals, atol=1e-5)


def test_sigmoid_fixed_points():
    sig = SigmoidParams()
    img = _img([[0.0, 0.5, 1.0]])
    out = _colors(C.sigmoidize(img, sig))
    assert abs(out[0][0] - 0.0) < 1e-6
    assert abs(out[0][2] - 1.0) < 2e-6


def test_decode_ictcp_pq_gray():
    """Achromatic ICtCp (Ct=Cp=0) decodes to gray RGB."""
    repr = ColorRepr(sys=ColorSystem.BT_2100_PQ, levels=ColorLevels.FULL,
                     bits=BitEncoding(10, 10, 0))
    # Ct/Cp are centered at 0.5 in the encoded representation
    img = _img([[0.5, 0.5, 0.5]])
    out = _colors(C.decode_color(img, repr, ColorPrimaries.BT_2020))
    # f32 PQ roundtrip + inexact published inverse matrix -> ~5e-4
    assert np.allclose(out[0], out[0][0], atol=1e-3)   # R==G==B
    assert abs(out[0][0] - 0.5) < 2e-3                 # I==PQ gray value


def test_dither_statistics():
    """Dithered quantization preserves the mean (blue noise)."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(np.full((1, 64, 64), 0.4, np.float32))
    out = np.asarray(D.dither(img, 3))
    levels = np.unique(out)
    assert len(levels) <= 3
    assert abs(out.mean() - 0.4) < 0.01


def test_dither_gamma_correct_low_depth():
    """<=4 bit dither with known gamma preserves *linear* mean."""
    from libplacebo_tpu.ops.dithering import DitherParams
    img = jnp.asarray(np.full((1, 128, 128), 0.5, np.float32))
    p = DitherParams(transfer=ColorTransfer.GAMMA22)
    out = np.asarray(D.dither(img, 2, p))
    lin_mean = (out ** 2.2).mean()
    assert abs(lin_mean - 0.5 ** 2.2) < 0.01


def test_error_diffusion_preserves_mean():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((1, 40, 56)).astype(np.float32))
    out = np.asarray(D.error_diffusion(img, 2))
    assert abs(out.mean() - np.asarray(img).mean()) < 0.01
    # only 4 quantization levels
    assert len(np.unique(out)) <= 4


@pytest.mark.parametrize("kname", ["floyd-steinberg", "atkinson",
                                   "jarvis-judice-ninke", "sierra-lite"])
def test_error_diffusion_kernels_run(kname):
    from libplacebo_tpu.core.dither import find_error_diffusion_kernel
    img = jnp.asarray(np.full((1, 16, 24), 0.3, np.float32))
    k = find_error_diffusion_kernel(kname)
    out = np.asarray(D.error_diffusion(img, 3, k))
    tol = 0.05 if kname == "atkinson" else 0.01  # atkinson leaks error
    assert abs(out.mean() - 0.3) < tol


def test_bt2020_cl_decode_matches_spec():
    """BT.2020 constant luminance: decode matches an independent float64
    Rec. BT.2020-2 oracle (reference pl_shader_decode_color CL branch)."""
    import numpy as np
    import jax.numpy as jnp
    from libplacebo_tpu.ops.color import decode_color
    from libplacebo_tpu.core.colorspace import (ColorLevels, ColorRepr,
                                                ColorSystem)

    def oetf(l):
        l = np.maximum(l, 0)
        return np.where(l < 0.0181, 4.5 * l, 1.0993 * l ** 0.45 - 0.0993)

    def eotf(e):
        e = np.maximum(e, 0)
        return np.where(e < 4.5 * 0.0181, e / 4.5,
                        ((e + 0.0993) / 1.0993) ** (1 / 0.45))

    rng = np.random.default_rng(7)
    cols = rng.random((64, 3))
    rp, gp, bp = cols[:, 0], cols[:, 1], cols[:, 2]
    yl = 0.2627 * eotf(rp) + 0.6780 * eotf(gp) + 0.0593 * eotf(bp)
    yp = oetf(yl)
    db, dr = bp - yp, rp - yp
    cb = db / np.where(db <= 0, 1.9404, 1.5816)
    cr = dr / np.where(dr <= 0, 1.7184, 0.9936)
    # full-range chroma encoding (reference pl_color_repr_decode:
    # center 128/255, positive excursion stretched so MAX_INT == +0.5;
    # golden-verified): signal = c / cmul + cmid
    cmid = 128 / 255
    cmul = 0.5 / (1.0 - cmid)
    img = jnp.asarray(np.stack(
        [yp, cb / cmul + cmid, cr / cmul + cmid]
    ).astype(np.float32)[:, :, None])
    repr = ColorRepr(sys=ColorSystem.BT_2020_C, levels=ColorLevels.FULL)
    out = np.asarray(decode_color(img, repr))[:, :, 0]
    assert np.abs(out - cols.T).max() < 2e-5


def test_bt2020_cl_roundtrip():
    """encode -> decode of BT.2020-C is the identity, both ranges."""
    import numpy as np
    import jax.numpy as jnp
    from libplacebo_tpu.ops.color import decode_color, encode_color
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem)

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.random((3, 24, 32)).astype(np.float32))
    for levels in (ColorLevels.FULL, ColorLevels.LIMITED):
        repr = ColorRepr(sys=ColorSystem.BT_2020_C, levels=levels,
                         bits=BitEncoding(10, 10, 0))
        back = decode_color(encode_color(rgb, repr), repr)
        assert float(jnp.max(jnp.abs(back - rgb))) < 2e-6, levels


@pytest.mark.parametrize("sys", [ColorSystem.BT_2100_PQ,
                                 ColorSystem.BT_2100_HLG,
                                 ColorSystem.XYZ])
def test_encode_hdr_systems_roundtrip(sys):
    """encode_color now covers every system decode_color does (reference
    pl_shader_encode_color, shaders/colorspace.c:462) — HDR passthrough
    targets (ICtCp PQ/HLG, XYZ) round-trip through decode."""
    repr = ColorRepr(sys=sys, levels=ColorLevels.FULL,
                     bits=BitEncoding(10, 10, 0))
    rng = np.random.default_rng(1)
    rgb = rng.random((64, 3)) * 0.8 + 0.05
    prim = ColorPrimaries.BT_2020 if sys != ColorSystem.XYZ \
        else ColorPrimaries.BT_709
    enc = C.encode_color(_img(rgb), repr, prim)
    dec = _colors(C.decode_color(enc, repr, prim))
    # PQ's steep toe amplifies the f32 noise of the LMS mixing into
    # ~1e-3 signal error for near-black components; the physically
    # meaningful criterion is linear light
    np.testing.assert_allclose(dec, rgb, atol=1e-2)
    if sys == ColorSystem.BT_2100_PQ:
        from libplacebo_tpu.core import transfer as tf
        lin_d = np.asarray(tf.pq_eotf(jnp.asarray(dec)))
        lin_s = np.asarray(tf.pq_eotf(jnp.asarray(rgb.astype(np.float32))))
        np.testing.assert_allclose(lin_d, lin_s, rtol=5e-3, atol=5e-6)
    else:
        np.testing.assert_allclose(dec, rgb, atol=3e-4)


def test_encode_ictcp_pq_gray_is_achromatic():
    """Neutral grays must encode to zero chroma (It = Ct = 0) in ICtCp."""
    repr = ColorRepr(sys=ColorSystem.BT_2100_PQ, levels=ColorLevels.FULL)
    gray = _img([[0.3, 0.3, 0.3], [0.7, 0.7, 0.7]])
    out = _colors(C.encode_color(gray, repr, ColorPrimaries.BT_2020))
    # both grays encode to the same (neutral) chroma center, and the
    # intensity channel carries the gray level
    np.testing.assert_allclose(out[0, 1:], out[1, 1:], atol=1e-4)
    np.testing.assert_allclose(out[:, 0], [0.3, 0.7], atol=1e-4)


def test_cone_distort_monochromacy_grayscales():
    from libplacebo_tpu.core.colorspace import VISION_MONOCHROMACY
    rng = np.random.default_rng(2)
    rgb = rng.random((16, 3))
    csp = CSP_SRGB
    out = _colors(C.cone_distort(_img(rgb), csp, VISION_MONOCHROMACY))
    np.testing.assert_allclose(out[:, 0], out[:, 1], atol=1e-5)
    np.testing.assert_allclose(out[:, 1], out[:, 2], atol=1e-5)


def test_cone_distort_normal_vision_identity():
    from libplacebo_tpu.core.colorspace import (Cone, ConeParams,
                                                VISION_NORMAL)
    rng = np.random.default_rng(3)
    rgb = rng.random((16, 3))
    out = _colors(C.cone_distort(_img(rgb), CSP_SRGB, VISION_NORMAL))
    np.testing.assert_allclose(out, rgb, atol=1e-5)
    out2 = _colors(C.cone_distort(_img(rgb), CSP_SRGB,
                                  ConeParams(Cone.M, 1.0)))
    np.testing.assert_allclose(out2, rgb, atol=1e-5)


def test_cone_distort_preserves_neutral():
    from libplacebo_tpu.core.colorspace import VISION_DEUTERANOPIA
    gray = _img([[0.18, 0.18, 0.18], [0.9, 0.9, 0.9]])
    out = _colors(C.cone_distort(gray, CSP_SRGB, VISION_DEUTERANOPIA))
    np.testing.assert_allclose(out, [[0.18] * 3, [0.9] * 3], atol=1e-5)


def test_channel_mix_einsum_precision_pinned():
    """The einsum channel-mix lowering must pin precision=highest: the
    TPU default runs the MXU dot in bf16, silently quantizing every
    channel mix to 8 mantissa bits (caught end-to-end as exact n/256
    outputs — a full-round correctness escape)."""
    import jax
    from libplacebo_tpu.ops import color as ops_color
    m = np.eye(3)
    with ops_color.mat_impl("einsum"):
        jaxpr = jax.make_jaxpr(
            lambda x: ops_color.mat_pointwise(x, m))(jnp.ones((3, 8, 8)))
    assert "HIGHEST" in str(jaxpr).upper(), str(jaxpr)


def test_log_curves_not_black_scaled():
    """V-Log/S-Log are scene-referred: display black/peak scaling must
    NOT apply (reference pl_shader_linearize returns before scale_out
    for them, shaders/colorspace.c:688-717)."""
    from libplacebo_tpu.core import transfer as tf_mod
    from libplacebo_tpu.core.colorspace import HdrMetadata
    sig = _img([[0.3, 0.5, 0.7]])
    for trc in (ColorTransfer.V_LOG, ColorTransfer.S_LOG1,
                ColorTransfer.S_LOG2):
        # metadata that WOULD rescale a black-scaled curve
        csp = ColorSpace(ColorPrimaries.BT_709, trc,
                         HdrMetadata(min_luma=0.5, max_luma=400.0))
        lin = np.asarray(C.linearize(sig, csp))
        pure = np.asarray(tf_mod.linearize(sig, trc))
        np.testing.assert_allclose(lin, pure, rtol=1e-6)
        # and the roundtrip stays the identity
        back = np.asarray(C.delinearize(C.linearize(sig, csp), csp))
        np.testing.assert_allclose(back, np.asarray(sig),
                                   rtol=1e-4, atol=1e-5)


def test_gamma_curves_black_scaled():
    """Gamma-family curves DO stretch into [min,max] (scale_out)."""
    from libplacebo_tpu.core.colorspace import (COLOR_SDR_WHITE,
                                                HdrMetadata)
    sig = _img([[1.0, 1.0, 1.0]])
    csp = ColorSpace(ColorPrimaries.BT_709, ColorTransfer.GAMMA22,
                     HdrMetadata(min_luma=0.0, max_luma=2 * COLOR_SDR_WHITE))
    lin = np.asarray(C.linearize(sig, csp))
    np.testing.assert_allclose(lin, 2.0, rtol=1e-5)


def test_extract_features_matches_oracle():
    """Reference pl_shader_extract_features (shaders/colorspace.c:1383):
    PQ-encoded IPT intensity of the linearized image."""
    from libplacebo_tpu.core.colorspace import (COLOR_SDR_WHITE,
                                                primaries_get)
    from libplacebo_tpu.core.gamut_mapping import LMS2IPT, ipt_rgb2lms
    from libplacebo_tpu.core import transfer as tf_mod
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((3, 6, 8), dtype=np.float32))
    csp = ColorSpace(ColorPrimaries.BT_709, ColorTransfer.BT_1886)
    feat = np.asarray(C.extract_features(img, csp))
    assert feat.shape == (1, 6, 8)
    # numpy oracle
    lin = np.asarray(C.linearize(img, csp))
    m = ipt_rgb2lms(primaries_get(csp.primaries)) * (COLOR_SDR_WHITE / 1e4)
    lms = np.einsum("ij,jhw->ihw", m, lin)
    lmsp = np.asarray(tf_mod.pq_oetf(jnp.asarray(np.maximum(lms, 0.0))))
    oracle = np.einsum("j,jhw->hw", LMS2IPT[0], lmsp)[None]
    np.testing.assert_allclose(feat, oracle, atol=2e-5)
    # feature map is monotone in intensity: brighter gray > darker gray
    g1 = C.extract_features(jnp.full((3, 2, 2), 0.2), csp)
    g2 = C.extract_features(jnp.full((3, 2, 2), 0.8), csp)
    assert float(g2[0, 0, 0]) > float(g1[0, 0, 0])
