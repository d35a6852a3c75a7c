"""Tone-map curve invariants — oracle: reference src/tests/tone_mapping.c
(monotonicity, endpoint fidelity, noop detection)."""
import numpy as np
import pytest

from libplacebo_tpu.core import tone_mapping as tm
from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale


def _params(fun, input_max_nits=1000.0, output_max_nits=203.0,
            lut_size=256):
    return tm.ToneMapParams(
        function=fun,
        input_scaling=HdrScaling.PQ,
        output_scaling=HdrScaling.PQ,
        lut_size=lut_size,
        input_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005),
        input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, input_max_nits),
        output_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005),
        output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, output_max_nits),
    )


@pytest.mark.parametrize("fun", tm.TONE_MAP_FUNCTIONS,
                         ids=lambda f: f.name)
def test_curve_monotonic(fun):
    p = _params(fun)
    lut = tm.generate(p)
    assert lut.shape == (256,)
    assert np.all(np.isfinite(lut))
    diffs = np.diff(lut.astype(np.float64))
    assert np.all(diffs >= -1e-5), f"{fun.name} not monotonic"


@pytest.mark.parametrize("fun", tm.TONE_MAP_FUNCTIONS,
                         ids=lambda f: f.name)
def test_curve_range(fun):
    p = _params(fun)
    lut = tm.generate(p)
    assert lut.min() >= p.output_min - 1e-5
    assert lut.max() <= p.output_max + 1e-5


@pytest.mark.parametrize("fun", tm.TONE_MAP_FUNCTIONS,
                         ids=lambda f: f.name)
def test_black_point_preserved(fun):
    # input_min == output_min, so the curve should map bottom near bottom
    p = _params(fun)
    lut = tm.generate(p)
    assert lut[0] <= p.output_min + 0.05


def test_clip_is_identity_within_range():
    p = _params(tm.TONE_MAP_CLIP, input_max_nits=203.0)
    lut = tm.generate(p)
    xs = np.linspace(p.input_min, p.input_max, p.lut_size)
    np.testing.assert_allclose(lut, np.clip(xs, p.output_min, p.output_max),
                               atol=1e-6)


def test_noop_detection():
    p = _params(tm.TONE_MAP_SPLINE, input_max_nits=203.0,
                output_max_nits=203.0)
    # same range and spline is bidirectional -> not noop (inverse possible)
    # but equal ranges means no reduction; reference: noop iff no BPC and
    # no range change
    assert tm.params_noop(p)
    p2 = _params(tm.TONE_MAP_SPLINE, input_max_nits=1000.0)
    assert not tm.params_noop(p2)


def test_sample_matches_generate():
    p = _params(tm.TONE_MAP_BT2390)
    lut = tm.generate(p)
    xs = np.linspace(p.input_min, p.input_max, p.lut_size)
    for i in [0, 64, 128, 255]:
        y = tm.sample(float(xs[i]), p)
        np.testing.assert_allclose(y, lut[i], atol=1e-5)


def test_find_by_name():
    assert tm.find_tone_map_function("bt2390") is tm.TONE_MAP_BT2390
    assert tm.find_tone_map_function("nope") is None
    assert len(tm.TONE_MAP_FUNCTIONS) == 12


def test_inverse_tone_mapping():
    # output brighter than input: requires a bidirectional function
    p = tm.ToneMapParams(
        function=tm.TONE_MAP_SPLINE,
        input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
        lut_size=128,
        input_min=0.0,
        input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0),
        output_min=0.0,
        output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0),
    )
    lut = tm.generate(p)
    assert np.all(np.isfinite(lut))
    # inverse mapping must actually expand the range
    assert lut[-1] > p.input_max


def test_param_compat():
    # legacy single-param API populates the right constant
    p = _params(tm.TONE_MAP_BT2390)
    p = tm.ToneMapParams(**{**p.__dict__, "param": 0.7})
    inferred = tm.params_infer(p)
    assert inferred.constants.knee_offset == 0.7


def test_st2094_40_with_metadata():
    from libplacebo_tpu.core.colorspace import HdrBezier, HdrMetadata
    hdr = HdrMetadata(ootf=HdrBezier(target_luma=600.0, knee_x=0.3,
                                     knee_y=0.4, anchors=(0.2, 0.5, 0.8)))
    p = tm.ToneMapParams(
        function=tm.TONE_MAP_ST2094_40,
        input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
        lut_size=128,
        input_min=0.0,
        input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0),
        output_min=0.0,
        output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0),
        hdr=hdr)
    lut = tm.generate(p)
    assert np.all(np.isfinite(lut))
    assert np.all(np.diff(lut) >= -1e-4)


def test_dynamic_st2094_matches_host_curves():
    """tone_map_dynamic('st2094-40'/'st2094-10') with FIXED traced stats
    must match the host curve generator (which is golden-verified
    against the compiled reference)."""
    import jax.numpy as jnp
    from libplacebo_tpu.core import tone_mapping as tm
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    from libplacebo_tpu.ops.tone_dynamic import tone_map_dynamic

    src_max_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0)
    src_avg_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 120.0)
    dst_min_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005)
    dst_max_pq = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0)

    for name in ("st2094-40", "st2094-10"):
        fun = tm.find_tone_map_function(name)
        p = tm.ToneMapParams(
            function=fun, lut_size=1024,
            input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
            input_min=0.0, input_max=src_max_pq, input_avg=src_avg_pq,
            output_min=dst_min_pq, output_max=dst_max_pq)
        lut = tm.generate(p)
        xs = np.linspace(0.0, src_max_pq, p.lut_size).astype(np.float32)
        dev = np.asarray(tone_map_dynamic(
            jnp.asarray(xs), name,
            src_max=jnp.float32(src_max_pq), src_avg=jnp.float32(src_avg_pq),
            dst_min=dst_min_pq, dst_max=dst_max_pq))
        # f32 PQ roundtrips on device vs f64 host: ~1e-3 worst case
        assert np.abs(dev - lut).max() < 2e-3, name
        # monotone non-decreasing
        assert np.all(np.diff(dev) > -1e-5), name


def test_dynamic_st2094_tracks_peak():
    """Raising the detected peak must lower mapped mid-tones (more
    compression) without any recompilation."""
    import jax
    import jax.numpy as jnp
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    from libplacebo_tpu.ops.tone_dynamic import tone_map_dynamic

    dst_min = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005)
    dst_max = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0)
    f = jax.jit(lambda x, mx, avg: tone_map_dynamic(
        x, "st2094-40", src_max=mx, src_avg=avg,
        dst_min=dst_min, dst_max=dst_max))
    xs = jnp.asarray(np.linspace(0.3, 0.7, 64, dtype=np.float32))
    avg = jnp.float32(hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 100.0))
    lo = np.asarray(f(xs, jnp.float32(
        hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 600.0)), avg))
    hi = np.asarray(f(xs, jnp.float32(
        hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 4000.0)), avg))
    assert np.mean(hi) < np.mean(lo)
