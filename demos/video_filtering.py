#!/usr/bin/env python3
"""video-filtering — offline filter-chain demo (reference:
demos/video-filtering.c): render-to-array usage without a display,
showing async dispatch (enqueue several frames before syncing).

Usage: python demos/video_filtering.py [--cpu]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.core.lut import parse_cube
    from libplacebo_tpu.ops.deband import DebandParams
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.render.renderer import (Renderer, RenderParams,
                                                Target)

    rng = np.random.default_rng(0)
    renderer = Renderer()

    # a warm-look 3DLUT, in-memory .cube
    warm = parse_cube("""LUT_3D_SIZE 2
0 0 0
1 0.05 0
0 0.95 0
1 1 0
0 0.05 0.9
1 0.1 0.9
0 1 0.9
1 1 0.92
""")

    params = RenderParams(
        deband=DebandParams(iterations=2),
        lut=warm, lut_type="conversion",
        upscaler="ewa_lanczossharp",
        peak_detect=None)
    target = Target(w=512, h=288, color=CSP_SRGB, bit_depth=8)

    # async processing: enqueue a batch, sync once (the reference demo's
    # async download path)
    outs = []
    t0 = time.perf_counter()
    for i in range(8):
        img = rng.random((144, 256, 3)).astype(np.float32)
        frame = frame_from_rgb(img, color=CSP_SRGB)
        outs.append(renderer.render(frame, target, params))
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"filtered 8 frames 256x144 -> 512x288 "
          f"(deband + EWA upscale + 3DLUT + dither) in {dt:.2f}s")
    result = np.asarray(outs[-1])
    print("output:", result.shape, "range",
          round(float(result.min()), 3), round(float(result.max()), 3))


if __name__ == "__main__":
    main()
