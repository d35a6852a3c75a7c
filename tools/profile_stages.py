"""Stage-ablation profiler for the flagship pipeline on the real TPU.

Times the full 1080p->4K EWA-Jinc + PQ->SDR pipeline with individual
stages toggled off, using the same serialized on-device chain as
bench.py (so the axon tunnel RTT does not pollute numbers).  The delta
vs the full pipeline is each stage's marginal cost.

Usage: python tools/profile_stages.py [n_frames]
"""
import os
import sys
import time
from dataclasses import replace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(params, target_bits=8):
    import jax.numpy as jnp

    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB)
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import Renderer, Target
    from libplacebo_tpu.ops.peak_detect import peak_detect_state_init

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    y = (rng.random((H, W)) * 219 + 16).astype(np.uint8)
    u = (rng.random((H // 2, W // 2)) * 224 + 16).astype(np.uint8)
    v = (rng.random((H // 2, W // 2)) * 224 + 16).astype(np.uint8)
    frame = frame_from_yuv420p(
        y, u, v, color=CSP_BT2100_PQ,
        repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                       levels=ColorLevels.LIMITED,
                       bits=BitEncoding(8, 8, 0)))
    target = Target(w=3840, h=2160, color=CSP_SRGB, bit_depth=target_bits)
    r = Renderer()
    pipeline = r._trace_pipeline(frame.meta_key(), target, params,
                                 frame.repr, frame.color, frame.get_crop())
    args = (peak_detect_state_init(), None, (None, None), (),
            None, ()) + tuple(p.data for p in frame.planes)
    return pipeline, args


def time_pipeline(fn, args, n=50):
    import jax

    def chained(state, grain, temporal, ovl, dv, hs, y, u, v, n):
        def body(i, carry):
            state, out = carry
            out, state, _ = fn(state, grain, temporal, ovl, dv, hs,
                            y + out[0, 0, 0] * 1e-12, u, v)
            return (state, out)
        out0, state, _ = fn(state, grain, temporal, ovl, dv, hs, y, u, v)
        _, out = jax.lax.fori_loop(0, n, body, (state, out0))
        return out

    jc = jax.jit(chained, static_argnames="n")
    out = jc(*args, n=n)
    _ = float(out.ravel()[0])
    t0 = time.perf_counter()
    out = jc(*args, n=n)
    _ = float(out.ravel()[0])
    dt = time.perf_counter() - t0
    return dt / (n + 1)


def main():
    from libplacebo_tpu.render.renderer import RenderParams

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    full = RenderParams(upscaler="ewa_lanczos")

    variants = [
        ("full", full, 8),
        ("no_peak", replace(full, peak_detect=None), 8),
        ("gamut_clip", replace(full, gamut_mapping="clip"), 8),
        ("gamut_none", replace(full, gamut_mapping="none"), 8),
        ("no_dither", full, None),
        ("no_antiring", replace(full, antiringing_strength=0.0), 8),
        ("bilinear", replace(full, upscaler="bilinear"), 8),
        ("separable_lanczos", replace(full, upscaler="lanczos"), 8),
        ("no_linear", replace(full, disable_linear_scaling=True), 8),
    ]

    results = {}
    base_ms = None
    for name, params, bits in variants:
        try:
            fn, args = build(params, bits)
            ms = time_pipeline(fn, args, n) * 1e3
        except Exception as e:
            print(f"{name:20s} FAILED: {e}")
            continue
        results[name] = ms
        if name == "full":
            base_ms = ms
        delta = "" if base_ms is None or name == "full" else \
            f"  (delta {base_ms - ms:+.2f} ms)"
        print(f"{name:20s} {ms:7.2f} ms/frame  {1e3/ms:6.1f} fps{delta}",
              flush=True)


if __name__ == "__main__":
    main()
