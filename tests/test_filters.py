"""Filter kernel sanity — oracle: reference src/tests/filters.c."""
import numpy as np
import pytest

from libplacebo_tpu.core import filters as flt


@pytest.mark.parametrize("cfg", flt.FILTER_CONFIGS, ids=lambda c: c.name)
def test_generate_all_configs(cfg):
    if cfg.kernel.opaque:
        return  # oversample has no weights
    f = flt.generate(cfg, lut_entries=64)
    assert np.all(np.isfinite(f.weights))
    if cfg.polar:
        assert f.weights.ndim == 1
        assert f.weights.shape == (64,)
        # center weight is max
        assert f.weights[0] == pytest.approx(f.weights.max())
    else:
        assert f.weights.ndim == 2
        assert f.row_size == f.weights.shape[1]
        assert f.row_size % 2 == 0
        # each row sums to 1 (energy preservation)
        np.testing.assert_allclose(f.weights.sum(axis=1), 1.0, atol=1e-5)


def test_kernel_center_values():
    # all interpolating kernels are 1 at x=0
    for name in ("lanczos", "spline36", "bicubic", "ewa_lanczos"):
        cfg = flt.find_filter_config(name)
        w = flt.sample_filter(cfg, np.array([0.0]))
        assert w[0] == pytest.approx(1.0, abs=1e-6), name


def test_kernel_zero_at_integers():
    # sinc-based kernels are 0 at nonzero integers
    cfg = flt.find_filter_config("lanczos")
    w = flt.sample_filter(cfg, np.array([1.0, 2.0]))
    np.testing.assert_allclose(w, 0.0, atol=1e-7)


def test_radius_cutoff():
    cfg = flt.find_filter_config("lanczos")
    radius, radius_zero = flt.filter_cutoffs(cfg, 0.0)
    assert radius == pytest.approx(3.0, abs=0.02)
    assert radius_zero == pytest.approx(1.0, abs=0.02)


def test_jinc_zero():
    # jinc radius constant is its first zero
    w = flt._w_jinc(np.array([flt.JINC_ZERO1]), 0, 0, 0)
    assert abs(w[0]) < 1e-6


def test_bessel_j1_vs_known():
    # j1(pi * 1.2196698912665045) == 0 (first jinc zero)
    x = np.pi * flt.JINC_ZERO1
    assert abs(flt._j1(np.array([x]))[0]) < 1e-6
    # j1 small-x behavior: j1(x) ~ x/2
    assert flt._j1(np.array([1e-3]))[0] == pytest.approx(5e-4, rel=1e-3)


def test_phase_symmetry():
    # phase 0 and phase 1 rows mirror each other (shifted by one tap)
    f = flt.generate(flt.find_filter_config("lanczos"), lut_entries=65)
    row0 = f.weights[0]
    row1 = f.weights[-1]
    np.testing.assert_allclose(row0[1:], row1[:-1][::-1], atol=1e-5)


def test_ewa_lanczossharp_blur():
    cfg = flt.find_filter_config("ewa_lanczossharp")
    assert cfg.blur == pytest.approx(0.98125058372237073562493)
    assert cfg.polar


def test_find_config_usage_filter():
    assert flt.find_filter_config(
        "ewa_lanczos", flt.FilterUsage.FRAME_MIXING) is None
    assert flt.find_filter_config(
        "ewa_lanczos", flt.FilterUsage.UPSCALING) is not None


def test_clamp_kills_negative_lobes():
    cfg = flt.find_filter_config("mitchell_clamp")
    xs = np.linspace(0, cfg.radius_bound(), 100)
    w = flt.sample_filter(cfg, xs)
    assert np.all(w >= 0)


def test_function_count():
    # reference has ~26 distinct function entries + aliases
    assert len(flt.FILTER_FUNCTIONS) >= 26
    assert len(flt.FILTER_CONFIGS) >= 30
