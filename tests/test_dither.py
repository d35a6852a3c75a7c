"""Dither matrix invariants — oracle: reference src/tests/dither.c."""
import numpy as np
import pytest

from libplacebo_tpu.core import dither as dth


@pytest.mark.parametrize("size", [2, 4, 8, 16])
def test_bayer_properties(size):
    m = dth.bayer_matrix(size)
    assert m.shape == (size, size)
    # all n^2 distinct values k/n^2, starting at 0 (reference
    # pl_generate_bayer_matrix, dither.c:36; golden-verified)
    vals = np.sort(m.flatten())
    expect = np.arange(size * size) / (size * size)
    np.testing.assert_allclose(vals, expect, atol=1e-6)


def test_bayer_2x2():
    m = dth.bayer_matrix(2)
    np.testing.assert_allclose(m * 4, [[0, 2], [3, 1]])


@pytest.mark.parametrize("shift", [4, 5])
def test_blue_noise_properties(shift):
    size = 1 << shift
    m = dth.blue_noise(shift)
    assert m.shape == (size, size)
    # full rank ordering: all n^2 distinct values
    vals = np.sort(m.flatten())
    expect = (np.arange(size * size) + 0.5) / (size * size)
    np.testing.assert_allclose(vals, expect, atol=1e-6)


def test_blue_noise_spectrum():
    # blue noise should have less low-frequency energy than white noise
    m = dth.blue_noise(5) - 0.5
    w = dth.white_noise(32, seed=1) - 0.5
    fm = np.abs(np.fft.fft2(m))
    fw = np.abs(np.fft.fft2(w))
    # compare energy in the lowest frequency band (excluding DC)
    lo = np.s_[1:4]
    assert fm[lo, lo].mean() < 0.5 * fw[lo, lo].mean()


def test_error_diffusion_kernels():
    assert len(dth.ERROR_DIFFUSION_KERNELS) == 10
    for k in dth.ERROR_DIFFUSION_KERNELS:
        norm = k.normalized()
        assert norm.shape == (3, 5)
        # diffused energy sums to <= 1 (atkinson deliberately loses 1/4)
        assert norm.sum() <= 1.0 + 1e-6
        if k.name != "atkinson":
            np.testing.assert_allclose(norm.sum(), 1.0, atol=1e-6)
        # nothing diffused to already-processed pixels
        assert np.all(norm[0, :3] == 0)


def test_find_kernel():
    fs = dth.find_error_diffusion_kernel("floyd-steinberg")
    assert fs is dth.ED_FLOYD_STEINBERG
    assert fs.divisor == 16
    assert dth.find_error_diffusion_kernel("nope") is None


def test_blue_noise_native_matches_contract():
    """native/dither.cc blue noise: full rank ordering + blue spectrum
    (low-frequency energy suppressed), same contract as the Python
    fallback (reference pl_generate_blue_noise, dither.c:175)."""
    from libplacebo_tpu.native import blue_noise_native
    bn = blue_noise_native(5)
    if bn is None:
        import pytest
        pytest.skip("no native toolchain")
    n = bn.size
    vals = np.sort(bn.ravel())
    np.testing.assert_allclose(vals, (np.arange(n) + 0.5) / n, atol=1e-7)
    size = 32
    F = np.abs(np.fft.fft2(bn - bn.mean())) ** 2
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    r = np.sqrt(np.minimum(yy, size - yy) ** 2 +
                np.minimum(xx, size - xx) ** 2)
    low = F[(r > 0) & (r < size / 8)].mean()
    high = F[r >= size / 4].mean()
    assert low < 0.1 * high, (low, high)
