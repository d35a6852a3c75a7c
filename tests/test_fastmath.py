"""core.fastmath — division-strength selection used by the fused tail.

Exact mode must be a plain divide (default everywhere, incl. the XLA
non-fused path and all CPU tests); the approx mode is only entered by
the Pallas fused kernel under LPTPU_APPROX_RECIP=1 and is validated
end-to-end by tools/tpu_vs_cpu.py on real hardware."""
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
    # straight-line formula in exact mode
    from libplacebo_tpu.ops.gamut import _softclip_dev
    rng = np.random.default_rng(7)
    value = jnp.asarray(rng.uniform(0, 2.0, (64,)).astype(np.float32))
    source = jnp.asarray(rng.uniform(0.5, 2.0, (64,)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0.1, 1.0, (64,)).astype(np.float32))
    out = np.asarray(_softclip_dev(value, source, target, 0.7))
    assert np.isfinite(out).all()
    # in-gamut passthrough: x <= knee keeps the raw value
    x = np.asarray(value) / np.maximum(np.asarray(target), 1e-9)
    passthrough = x <= 0.7
    np.testing.assert_allclose(out[passthrough],
                               np.asarray(value)[passthrough])
