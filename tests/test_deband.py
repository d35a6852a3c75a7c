"""Debanding tests — behavior oracle: banded gradients smooth out,
detail preserved (reference pl_shader_deband semantics)."""
import numpy as np
import jax.numpy as jnp

from libplacebo_tpu.ops.deband import DebandParams, deband


def _banded_gradient(h=64, w=256):
    """A shallow gradient quantized to 8-bit levels — the classic
    banding case (step 1/255 ≈ 0.004, below the deband threshold)."""
    g = np.linspace(0.3, 0.4, w, dtype=np.float32)
    banded = np.round(g * 255) / 255
    return jnp.asarray(np.broadcast_to(banded, (1, h, w)).copy())


def test_deband_smooths_bands():
    img = _banded_gradient()
    p = DebandParams(iterations=2, threshold=8.0, grain=0.0)
    out = np.asarray(deband(img, p))
    # debanding dithers the hard 1/255 steps into many more levels
    assert len(np.unique(out)) > 4 * len(np.unique(np.asarray(img)))
    # mean brightness preserved
    assert abs(out.mean() - np.asarray(img).mean()) < 0.002


def test_deband_preserves_edges():
    """A strong edge (above threshold) must NOT be smoothed."""
    img = np.zeros((1, 64, 64), np.float32)
    img[..., 32:] = 1.0
    p = DebandParams(iterations=1, threshold=3.0, grain=0.0)
    out = np.asarray(deband(jnp.asarray(img), p))
    # edge intact: values still 0/1 at distance from the edge
    np.testing.assert_allclose(out[..., :16], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[..., 48:], 1.0, atol=1e-6)


def test_grain_only_mode():
    """iterations=0 + grain>0 acts as a pure grain function
    (reference shaders/sampling.h:111-113)."""
    img = jnp.full((1, 64, 64), 0.5, jnp.float32)
    p = DebandParams(iterations=0, grain=50.0)
    out = np.asarray(deband(img, p))
    assert not np.allclose(out, 0.5)
    assert abs(out.mean() - 0.5) < 0.005
    # grain strength limited
    assert np.abs(out - 0.5).max() <= 50.0 / 1000.0 / 2 + 1e-6


def test_grain_neutral_protection():
    """Pixels at the neutral value receive no grain."""
    img = jnp.zeros((1, 32, 32), jnp.float32)
    p = DebandParams(iterations=0, grain=100.0, grain_neutral=(0.0,))
    out = np.asarray(deband(img, p))
    np.testing.assert_allclose(out, 0.0, atol=1e-7)


def test_seed_changes_noise():
    img = jnp.full((1, 32, 32), 0.5, jnp.float32)
    p = DebandParams(iterations=0, grain=20.0)
    a = np.asarray(deband(img, p, seed=1))
    b = np.asarray(deband(img, p, seed=2))
    assert not np.array_equal(a, b)


def test_two_component_plane_grain():
    """NV12-style packed chroma (2 components) must not broadcast-crash
    against the 3-wide grain_neutral default, and a per-plane neutral
    protects both channels (regression: HIGH_QUALITY render of a
    2-plane 420 frame crashed in the grain stage)."""
    img = jnp.full((2, 32, 32), 0.5, jnp.float32)
    p = DebandParams(iterations=0, grain=100.0)
    out = np.asarray(deband(img, p))                 # default neutral
    assert out.shape == (2, 32, 32)
    out2 = np.asarray(deband(img, p, neutral=(0.5, 0.5)))
    np.testing.assert_allclose(out2, 0.5, atol=1e-7)


def test_plane_grain_neutral_reference_values():
    """renderer.c:1716-1761: limited luma 16/256*out_scale, chroma
    0.5*out_scale; RGB systems use the luma neutral everywhere."""
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem)
    from libplacebo_tpu.ops.deband import plane_grain_neutral

    rep = ColorRepr(sys=ColorSystem.BT_709, levels=ColorLevels.LIMITED,
                    bits=BitEncoding(sample_depth=10))
    sc = 1024 / 1023.0
    np.testing.assert_allclose(plane_grain_neutral(rep, (0,)),
                               [16 / 256.0 * sc], rtol=1e-6)
    np.testing.assert_allclose(plane_grain_neutral(rep, (1, 2)),
                               [0.5 * sc, 0.5 * sc], rtol=1e-6)
    rgb = ColorRepr(sys=ColorSystem.RGB, levels=ColorLevels.FULL)
    np.testing.assert_allclose(plane_grain_neutral(rgb, (0, 1, 2)),
                               [0.0, 0.0, 0.0], atol=0)
