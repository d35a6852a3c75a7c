"""HDR peak detection + dynamic tone mapping tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.ops import peak_detect as pk
from libplacebo_tpu.ops import tone_dynamic as td
from libplacebo_tpu.core import tone_mapping as tm
from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
from libplacebo_tpu.core.transfer import pq_oetf


def _img_of_nits(nits, shape=(3, 64, 64)):
    return jnp.full(shape, nits / 203.0, jnp.float32)


def test_peak_of_uniform_frame():
    img = _img_of_nits(1000.0)
    p = pk.PeakDetectParams(smoothing_period=0.0)
    avg, peak, state = pk.detect_peak(img, pk.peak_detect_state_init(), p)
    expect = float(np.asarray(pq_oetf(jnp.asarray(1000.0 / 10000.0))))
    assert abs(float(peak) - expect) < 2e-3
    assert abs(float(avg) - expect) < 2e-3


def test_percentile_cuts_outliers():
    # mostly 100-nit frame with a single 4000-nit pixel
    img = np.full((3, 64, 64), 100.0 / 203.0, np.float32)
    img[:, 0, 0] = 4000.0 / 203.0
    p100 = pk.PeakDetectParams(smoothing_period=0.0, percentile=100.0)
    p99 = pk.PeakDetectParams(smoothing_period=0.0, percentile=99.0)
    _, peak100, _ = pk.detect_peak(jnp.asarray(img),
                                   pk.peak_detect_state_init(), p100)
    _, peak99, _ = pk.detect_peak(jnp.asarray(img),
                                  pk.peak_detect_state_init(), p99)
    pq4000 = float(np.asarray(pq_oetf(jnp.asarray(4000.0 / 10000.0))))
    pq100 = float(np.asarray(pq_oetf(jnp.asarray(100.0 / 10000.0))))
    assert abs(float(peak100) - pq4000) < 5e-3     # true max
    assert float(peak99) < pq100 + 0.1             # outlier cut off


def test_iir_smoothing():
    p = pk.PeakDetectParams(smoothing_period=10.0,
                            scene_threshold_low=0, scene_threshold_high=0)
    state = pk.peak_detect_state_init()
    # first frame initializes directly
    _, peak1, state = pk.detect_peak(_img_of_nits(1000.0), state, p)
    # sudden darker frame: smoothed value moves only partially
    _, peak2, state = pk.detect_peak(_img_of_nits(100.0), state, p)
    pq1000 = float(np.asarray(pq_oetf(jnp.asarray(0.1))))
    pq100 = float(np.asarray(pq_oetf(jnp.asarray(0.01))))
    assert float(peak2) < pq1000 - 1e-3
    assert float(peak2) > pq100 + 1e-3


def test_scene_change_cuts_smoothing():
    slow = pk.PeakDetectParams(smoothing_period=100.0,
                               scene_threshold_low=0,
                               scene_threshold_high=0)
    fast = pk.PeakDetectParams(smoothing_period=100.0,
                               scene_threshold_low=0.5,
                               scene_threshold_high=1.0)
    s1 = s2 = pk.peak_detect_state_init()
    _, _, s1 = pk.detect_peak(_img_of_nits(1000.0), s1, slow)
    _, _, s2 = pk.detect_peak(_img_of_nits(1000.0), s2, fast)
    _, pk_slow, _ = pk.detect_peak(_img_of_nits(10.0), s1, slow)
    _, pk_fast, _ = pk.detect_peak(_img_of_nits(10.0), s2, fast)
    # scene-change detection jumps to the new value much faster
    assert float(pk_fast) < float(pk_slow) - 0.05


def test_black_frame():
    p = pk.PeakDetectParams(smoothing_period=0.0)
    img = jnp.zeros((3, 32, 32), jnp.float32)
    avg, peak, state = pk.detect_peak(img, pk.peak_detect_state_init(), p)
    assert float(peak) <= 1e-4


def test_dynamic_matches_static_tone_map():
    """tone_map_dynamic with static inputs == core generate() curve."""
    for name in ("spline", "bt2390"):
        in_max = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0)
        out_min = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005)
        out_max = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0)
        p = tm.ToneMapParams(
            function=tm.find_tone_map_function(name),
            input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
            lut_size=512, input_min=0.0, input_max=in_max,
            output_min=out_min, output_max=out_max)
        lut = tm.generate(p)
        xs = np.linspace(0.0, in_max, 512).astype(np.float32)
        dyn = np.asarray(td.tone_map_dynamic(
            jnp.asarray(xs), name,
            src_max=jnp.asarray(in_max, jnp.float32),
            src_avg=jnp.asarray(0.0, jnp.float32),
            dst_min=out_min, dst_max=out_max))
        np.testing.assert_allclose(dyn, lut, atol=3e-3, err_msg=name)


def test_dynamic_is_monotonic_and_bounded():
    xs = jnp.asarray(np.linspace(0, 0.9, 256).astype(np.float32))
    out_max = hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0)
    for name in ("spline", "bt2390"):
        y = np.asarray(td.tone_map_dynamic(
            xs, name, src_max=jnp.asarray(0.75, jnp.float32),
            src_avg=jnp.asarray(0.3, jnp.float32),
            dst_min=0.0, dst_max=out_max))
        assert np.all(np.diff(y) >= -1e-4), name
        assert y.max() <= out_max + 1e-5, name


def test_renderer_peak_state_advances():
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import Renderer, Target
    from libplacebo_tpu.core.colorspace import (CSP_BT2100_PQ, CSP_SRGB,
                                                ColorRepr, ColorSystem,
                                                ColorLevels, BitEncoding)
    rng = np.random.default_rng(0)
    y = (rng.random((48, 64)) * 219 + 16).astype(np.uint8)
    u = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    v = (rng.random((24, 32)) * 224 + 16).astype(np.uint8)
    frame = frame_from_yuv420p(y, u, v, color=CSP_BT2100_PQ,
                               repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                                              levels=ColorLevels.LIMITED,
                                              bits=BitEncoding(8, 8, 0)))
    r = Renderer()
    assert float(jnp.sum(r._peak_state)) == 0.0
    out = r.render(frame, Target(w=64, h=48, color=CSP_SRGB))
    assert float(jnp.sum(jnp.abs(r._peak_state))) > 0.0
    assert np.all(np.isfinite(np.asarray(out)))


def test_radix_percentile_matches_full_histogram():
    """The two-level radix percentile (8+8 sibling reductions) must
    reproduce the full 64-bin histogram percentile exactly (reference
    measure_peak, colorspace.c:1020-1065)."""
    import numpy as np
    import jax.numpy as jnp
    from libplacebo_tpu.ops import peak_detect as P
    from libplacebo_tpu.core.transfer import pq_oetf_fast
    from libplacebo_tpu.core.colorspace import COLOR_SDR_WHITE

    rng = np.random.default_rng(42)
    st = P.peak_detect_state_init()
    for trial in range(4):
        img = (rng.random((3, 48, 80)) ** 2 * 12).astype(np.float32)
        for pct in (99.995, 95.0, 50.0, 1.0):
            prm = P.PeakDetectParams(percentile=pct, smoothing_period=0)
            _, mx, _ = P.detect_peak(jnp.asarray(img), st, prm)

            # independent numpy oracle: full 64-bin histogram
            maxrgb = np.max(img, axis=0)
            pq = np.clip(np.asarray(pq_oetf_fast(jnp.asarray(
                maxrgb * (COLOR_SDR_WHITE / 10000)))), 0, 1)
            pq14 = np.round(pq * P.PQ_MAX).astype(np.int64)
            act = pq > prm.black_cutoff / 100.0
            bins = np.clip((pq14 >> (P.PQ_BITS - P.HIST_BITS)) -
                           P.HIST_BIAS, 0, 63)
            hist = np.bincount(bins[act].ravel(),
                               minlength=64).astype(np.float64)
            total = hist.sum()
            assert total > 0
            target = np.ceil(pct / 100 * total)
            csum = np.cumsum(hist)
            k = int(np.argmax(csum >= target))
            cl = csum[k] - hist[k]
            ch = csum[k] + 1
            pq_low = ((k + P.HIST_BIAS) << (P.PQ_BITS - P.HIST_BITS)) \
                / P.PQ_MAX
            pq_high = ((k + 1 + P.HIST_BIAS) <<
                       (P.PQ_BITS - P.HIST_BITS)) / P.PQ_MAX
            if ch > total:
                pq_high = pq.max()
            expect = pq_low + (pq_high - pq_low) * \
                (target - cl) / max(ch - cl, 1.0)
            assert abs(float(mx) - expect) < 2e-6, (trial, pct)


def test_allow_delayed_applies_previous_state():
    """allow_delayed (reference colorspace.h:144-147): the tone map
    receives the PREVIOUS smoothed stats; the state update itself is
    identical to same-frame detection.  First frame falls back to the
    static metadata peak."""
    import jax.numpy as jnp
    from libplacebo_tpu.ops.peak_detect import (PeakDetectParams,
                                                applied_stats, detect_peak,
                                                peak_detect_state_init)
    rng = np.random.default_rng(7)
    img = jnp.asarray(rng.random((3, 32, 48)).astype(np.float32) * 3.0)
    p = PeakDetectParams(percentile=99.5, allow_delayed=True)
    state0 = peak_detect_state_init()
    static_max = 0.75

    avg1, max1, state1 = applied_stats(img, state0, p, static_max)
    # unset state -> static fallback applied
    assert float(avg1) == 0.0
    assert abs(float(max1) - static_max) < 1e-7
    # state updates exactly like same-frame detection
    _, _, ref_state = detect_peak(img, state0, p)
    np.testing.assert_allclose(np.asarray(state1), np.asarray(ref_state),
                               atol=0)

    img2 = img * 0.5
    avg2, max2, state2 = applied_stats(img2, state1, p, static_max)
    # second frame applies the first frame's smoothed stats verbatim
    np.testing.assert_allclose([float(avg2), float(max2)],
                               np.asarray(state1), atol=0)
    # non-delayed applies the current frame's stats instead
    p_now = PeakDetectParams(percentile=99.5, allow_delayed=False)
    avg_n, max_n, _ = applied_stats(img2, state1, p_now, static_max)
    assert float(max_n) != float(max2)
