#!/usr/bin/env python3
"""BASELINE.md config-5 benchmark on the real TPU: the FULL pipeline —
1080p HDR10 yuv420p -> deband -> AV1 film grain -> EWA-Jinc 2x ->
dynamic peak detect -> tone map -> perceptual gamut -> sRGB encode ->
error-diffusion dither to 8-bit -> 4K.

Same serialized on-device chain as bench.py (axon fetch RTT excluded).
Prints one JSON line per variant (ED on / blue-noise dither).

Usage: python tools/bench_config5.py [n_frames]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(params):
    import jax

    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB)
    from libplacebo_tpu.ops import film_grain as ops_fg
    from libplacebo_tpu.ops.peak_detect import peak_detect_state_init
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import Renderer, Target

    # the representative AV1 grain stream config from test_film_grain
    from tests.test_film_grain import DATA as GRAIN_DATA

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
    frame.film_grain = GRAIN_DATA
    target = Target(w=3840, h=2160, color=CSP_SRGB, bit_depth=8)

    r = Renderer()
    pipeline = r._trace_pipeline(
        frame.meta_key(), target, params, frame.repr, frame.color,
        frame.get_crop(), frame.film_grain)
    grain_tables = None
    if params.film_grain:
        plane_metas = frame.meta_key()[0]
        cfgs, _ = r._grain_cfgs(plane_metas, frame.repr, frame.film_grain)
        grain_tables = tuple(
            ops_fg.prepare_av1_grain(frame.film_grain, cfg,
                                     meta[0][-2], meta[0][-1])
            if cfg else None
            for cfg, meta in zip(cfgs, plane_metas))
    args = (peak_detect_state_init(), grain_tables, (None, None), (),
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
    return (time.perf_counter() - t0) / (n + 1)


def main():
    from libplacebo_tpu.core.cache import set_xla_cache_dir
    set_xla_cache_dir(os.path.join(REPO, ".xla_cache"))

    from libplacebo_tpu.ops.deband import DebandParams
    from libplacebo_tpu.render.renderer import RenderParams

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    base = dict(upscaler="ewa_lanczos",
                deband=DebandParams(iterations=2),
                film_grain=True)
    variants = [
        ("config5_error_diffusion",
         RenderParams(error_diffusion="floyd-steinberg", **base)),
        ("config5_blue_noise", RenderParams(**base)),
    ]
    if "--ablate" in sys.argv:
        variants += [
            # film_grain defaults True and the frame carries grain data,
            # so the no-grain ablations must opt out explicitly
            ("deband_only", RenderParams(upscaler="ewa_lanczos",
                                         deband=base["deband"],
                                         film_grain=False)),
            ("grain_only", RenderParams(upscaler="ewa_lanczos",
                                        film_grain=True)),
            ("neither", RenderParams(upscaler="ewa_lanczos",
                                     film_grain=False)),
        ]
    for name, params in variants:
        fn, args = build(params)
        spf = time_pipeline(fn, args, n)
        print(json.dumps({
            "metric": f"{name}: 1080p->4K deband+grain+EWA+PQ->SDR"
                      f"+dither, frames/sec/chip",
            "value": round(1.0 / spf, 2),
            "unit": "fps",
            "vs_baseline": round(1.0 / spf / 60.0, 3),
        }), flush=True)
        if name == "config5_error_diffusion":
            # keep the README's config-5 number fresh (readme_bench
            # check in the suite enforces it)
            try:
                sys.path.insert(0, os.path.dirname(
                    os.path.abspath(__file__)))
                import readme_bench
                readme_bench.stamp_config5(1.0 / spf)
            except Exception as e:                  # noqa: BLE001
                print(f"README stamp skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
