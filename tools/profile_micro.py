"""Micro-profiler: individual pipeline ops on the real TPU at 4K.

Times each op with a serialized on-device chain (the bench.py trick) so
dispatch/fetch overhead cancels.  Usage: python tools/profile_micro.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, n=30):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        out = fn(*a)
        ref = out[0] if isinstance(out, tuple) else out

        def body(i, carry):
            o = fn(a[0] + carry.ravel()[0] * 1e-12, *a[1:])
            return (o[0] if isinstance(o, tuple) else o).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, ref.astype(jnp.float32))

    jc = jax.jit(chained)
    out = jc(*args)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    out = jc(*args)
    _ = float(out.ravel()[0])
    dt = (time.perf_counter() - t0) / (n + 1)
    print(f"{name:32s} {dt*1e3:7.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from libplacebo_tpu.core.colorspace import (CSP_BT2100_PQ, CSP_SRGB,
                                                primaries_get,
                                                ColorPrimaries)
    from libplacebo_tpu.ops import gamut as ops_gamut
    from libplacebo_tpu.ops import peak_detect as ops_peak
    from libplacebo_tpu.ops import color as ops_color
    from libplacebo_tpu.core.transfer import (pq_eotf_fast, pq_oetf_fast)

    H, W = 2160, 3840
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), np.float32) * 2.0)
    state = jnp.zeros((2,), jnp.float32)

    # --- peak detect variants
    from libplacebo_tpu.ops.peak_detect import PeakDetectParams
    pp = PeakDetectParams()
    timeit("peak full (pct=100)", lambda x: ops_peak.detect_peak(
        x, state, pp)[2], img)
    pp995 = PeakDetectParams(percentile=99.5)
    timeit("peak full (pct=99.5)", lambda x: ops_peak.detect_peak(
        x, state, pp995)[2], img)
    timeit("maxrgb+pq only", lambda x: pq_oetf_fast(
        jnp.maximum(jnp.max(x, axis=-3), 0.0) * 0.0203), img)

    # --- transfer roundtrips at 4K
    timeit("pq_oetf_fast 3ch", lambda x: pq_oetf_fast(x * 0.0203), img)
    timeit("pq_eotf_fast 3ch", lambda x: pq_eotf_fast(
        jnp.clip(x * 0.3, 0, 1)), img)
    timeit("srgb delinearize 3ch", lambda x: ops_color.delinearize(
        jnp.clip(x * 0.4, 0, 1), CSP_SRGB), img)
    timeit("matmul3x3", lambda x: ops_color.apply_matrix(
        x, np.eye(3, dtype=np.float32) * 0.9), img)

    # --- gamut/color-map
    dst_min, dst_max = 0.0, 0.58
    b_src = ops_gamut.fit_boundary(primaries_get(ColorPrimaries.BT_2020),
                                   dst_min, dst_max)
    b_dst = ops_gamut.fit_boundary(primaries_get(ColorPrimaries.BT_709),
                                   dst_min, dst_max)
    b_src_c = ops_gamut.ipt_space(primaries_get(ColorPrimaries.BT_2020),
                                  dst_min, dst_max)
    b_dst_c = ops_gamut.ipt_space(primaries_get(ColorPrimaries.BT_709),
                                  dst_min, dst_max)
    NORM = 203.0 / 10000.0
    from libplacebo_tpu.core import tone_mapping as tm
    fun = tm.find_tone_map_function("spline")
    p = tm.ToneMapParams(function=fun, input_scaling=tm.HdrScaling.PQ
                         if hasattr(tm, "HdrScaling") else None,
                         output_scaling=None)
    # build tone fn like color_map_stage does
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    tp = tm.ToneMapParams(
        function=fun, input_scaling=HdrScaling.PQ,
        output_scaling=HdrScaling.PQ, lut_size=256,
        input_min=0.0, input_max=0.82, output_min=0.0, output_max=0.58)
    tone = lambda x: tm.apply_device(x, tp)

    timeit("color_map_ipt tone+perceptual", lambda x: ops_gamut.color_map_ipt(
        x, tone, "perceptual", b_src, b_dst, to_norm=NORM), img)
    timeit("color_map_ipt tone+clip", lambda x: ops_gamut.color_map_ipt(
        x, tone, "clip", b_src_c, b_dst_c, to_norm=NORM), img)
    timeit("color_map_ipt tone only", lambda x: ops_gamut.color_map_ipt(
        x, tone, None, b_src_c, b_dst_c, to_norm=NORM), img)
    timeit("tone spline alone (1ch)", lambda x: tone(x[0]), img)

    # --- 1080p-side ops
    img1080 = jnp.asarray(rng.random((3, 1080, 1920), np.float32))
    timeit("linearize pq 1080p", lambda x: ops_color.linearize(
        x, CSP_BT2100_PQ), img1080)


if __name__ == "__main__":
    main()
