"""Pallas kernel tests (interpret mode on CPU) — cross-checked against
the pure-XLA oracle implementations."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core.dither import (ED_ATKINSON, ED_FLOYD_STEINBERG,
                                        ED_JARVIS_JUDICE_NINKE,
                                        ED_SIERRA_LITE, ED_SIMPLE)
from libplacebo_tpu.ops.dithering import error_diffusion_scan
from libplacebo_tpu.ops.pallas.error_diffusion import error_diffusion_pallas


@pytest.mark.parametrize("kernel", [ED_SIMPLE, ED_SIERRA_LITE,
                                    ED_FLOYD_STEINBERG, ED_ATKINSON,
                                    ED_JARVIS_JUDICE_NINKE],
                         ids=lambda k: k.name)
def test_pallas_matches_scan_oracle(kernel):
    rng = np.random.default_rng(42)
    img = jnp.asarray(rng.random((2, 48, 72)).astype(np.float32))
    ref = np.asarray(error_diffusion_scan(img, 3, kernel))
    pal = np.asarray(error_diffusion_pallas(img, 3, kernel,
                                            interpret=True))
    np.testing.assert_array_equal(ref, pal)


def test_pallas_ed_odd_sizes():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((1, 37, 53)).astype(np.float32))
    out = np.asarray(error_diffusion_pallas(img, 2, interpret=True))
    assert out.shape == (1, 37, 53)
    assert abs(out.mean() - float(img.mean())) < 0.02
    assert len(np.unique(out)) <= 4


def test_pallas_ed_gradient_quality():
    """ED of a shallow gradient should track the local mean closely
    (much better than rounding)."""
    g = np.broadcast_to(np.linspace(0.3, 0.45, 128, dtype=np.float32),
                        (64, 128)).copy()
    img = jnp.asarray(g[None])
    out = np.asarray(error_diffusion_pallas(img, 3, interpret=True))[0]
    # compare block means
    blocks_in = g.reshape(8, 8, 16, 8).mean(axis=(1, 3))
    blocks_out = out.reshape(8, 8, 16, 8).mean(axis=(1, 3))
    assert np.abs(blocks_in - blocks_out).max() < 0.02
    # plain rounding would collapse to ~2 levels with hard banding
    rounded = np.round(g * 7) / 7
    blocks_round = rounded.reshape(8, 8, 16, 8).mean(axis=(1, 3))
    assert np.abs(blocks_in - blocks_out).max() < \
        np.abs(blocks_in - blocks_round).max()


@pytest.mark.parametrize("shape,s", [((3, 37, 53), 2), ((1, 130, 200), 1),
                                     ((2, 200, 131), 3)])
def test_pallas_shear_kernels_exact(shape, s):
    """Pallas shear/unshear (ops/pallas/shear.py) vs a direct numpy
    shear: exact, and an exact roundtrip."""
    import jax
    from libplacebo_tpu.ops.pallas.shear import (shear_to_colmaj,
                                                 unshear_from_colmaj)
    C, H, W = shape
    rng = np.random.default_rng(7)
    x = rng.random((C, H, W)).astype(np.float32)
    Ws = W + (H - 1) * s
    Wp, Hp, Wsp = [-(-v // 128) * 128 for v in (W, H, Ws)]

    ref = np.zeros((Wsp, C, Hp), np.float32)
    for y in range(H):
        ref[y * s:y * s + W, :, y] = x[:, y, :].T

    xcm = jnp.pad(jnp.moveaxis(jnp.asarray(x), 2, 0),
                  ((0, Wp - W), (0, 0), (0, Hp - H)))
    cm = shear_to_colmaj(xcm, Wsp, s, W, H, interpret=True)
    np.testing.assert_array_equal(np.asarray(cm), ref)
    back = unshear_from_colmaj(cm, Wp, s, W, H, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xcm))


def test_pallas_shear_flag_fallback_exact(monkeypatch):
    """LPTPU_PALLAS_SHEAR=0 (XLA bit-roll path) is bit-exact vs the
    default Pallas-shear path."""
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.random((3, 64, 100)).astype(np.float32))
    monkeypatch.setenv("LPTPU_PALLAS_SHEAR", "0")
    old = np.asarray(error_diffusion_pallas(img, 6, ED_JARVIS_JUDICE_NINKE,
                                            interpret=True))
    monkeypatch.setenv("LPTPU_PALLAS_SHEAR", "1")
    new = np.asarray(error_diffusion_pallas(img, 6, ED_JARVIS_JUDICE_NINKE,
                                            interpret=True))
    np.testing.assert_array_equal(old, new)
