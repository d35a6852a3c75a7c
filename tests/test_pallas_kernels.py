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
