"""core.fastmath — division-strength selection used by the fused tail.

Exact mode must be a plain divide (default everywhere, incl. the XLA
non-fused path and all CPU tests); the approx mode is entered only by
the Pallas fused kernel, where it is ON by default (LPTPU_APPROX_RECIP=0
opts out, read once at process start) and is validated end-to-end by
tools/tpu_vs_cpu.py on real hardware."""
import numpy as np
import jax.numpy as jnp

from libplacebo_tpu.core import fastmath


def test_exact_mode_is_plain_division():
    a = jnp.asarray([1.0, 2.5, -3.0])
    b = jnp.asarray([7.0, 0.3, 11.0])
    assert fastmath.recip_mode() == "exact"
    np.testing.assert_array_equal(np.asarray(fastmath.fdiv(a, b)),
                                  np.asarray(a / b))
    np.testing.assert_array_equal(np.asarray(fastmath.recip(b)),
                                  np.asarray(1.0 / b))


def test_context_sets_and_restores_mode():
    assert fastmath.recip_mode() == "exact"
    with fastmath.approx_recip(False):
        # disabled context stays exact
        assert fastmath.recip_mode() == "exact"
    try:
        with fastmath.approx_recip(True):
            assert fastmath.recip_mode() == "approx"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # restored even on exceptions
    assert fastmath.recip_mode() == "exact"


def test_gamut_softclip_unchanged_in_exact_mode():
    # the fdiv rewrite of _softclip_dev must be value-identical to the
    # straight-line true-divide formula in exact mode — over the FULL
    # domain, including the mapped (x > knee) branch (ADVICE r2: the
    # old check only covered the passthrough region)
    from libplacebo_tpu.ops.gamut import _softclip_dev
    rng = np.random.default_rng(7)
    value = jnp.asarray(rng.uniform(0, 2.0, (512,)).astype(np.float32))
    source = jnp.asarray(rng.uniform(0.5, 2.0, (512,)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0.1, 1.0, (512,)).astype(np.float32))
    knee = 0.7
    out = np.asarray(_softclip_dev(value, source, target, knee))
    assert np.isfinite(out).all()

    def oracle(value, source, target, j):
        # straight-line f32 formula with TRUE divides everywhere,
        # mirroring _softclip_dev's guards (gamut_mapping.c:577)
        safe_t = jnp.maximum(target, 1e-9)
        peak = source / safe_t
        x = jnp.minimum(value / safe_t, peak)
        denom_a = j * j - 2.0 * j + peak
        a = (-j * j * (peak - 1.0)) / \
            jnp.where(jnp.abs(denom_a) < 1e-9, 1e-9, denom_a)
        bb = (j * j - 2.0 * j * peak + peak) / jnp.maximum(1e-2, peak - 1.0)
        scale = (bb * bb + 2.0 * bb * j + j * j) / (bb - a)
        denom = x + bb
        denom = jnp.where(jnp.abs(denom) < 1e-6,
                          jnp.where(denom < 0, -1e-6, 1e-6), denom)
        mapped = (scale * (x + a)) / denom * safe_t
        t = jnp.clip((peak - 1.0) / 0.02, 0.0, 1.0)
        w = t * t * (3.0 - 2.0 * t)
        blended = value + (mapped - value) * w
        return jnp.where(x <= j, value, blended)

    ref = np.asarray(oracle(value, source, target, knee))
    np.testing.assert_array_equal(out, ref)
    # and the mapped branch is actually exercised by the domain
    x = np.asarray(value) / np.maximum(np.asarray(target), 1e-9)
    assert (x > knee).any() and (x <= knee).any()
