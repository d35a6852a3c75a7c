#!/usr/bin/env python3
"""video-filtering — offline filter-chain demo (reference:
demos/video-filtering.c): render-to-array usage without a display,
showing async dispatch (enqueue several frames before syncing).

With --input the chain runs on a real image (PNG/JPEG via PIL) or a
YUV4MPEG2 clip instead of synthetic noise; --output writes the result
(.png for stills, .y4m for clips).

Usage: python demos/video_filtering.py [--cpu]
           [--input in.png|in.y4m] [--output out.png|out.y4m]
           [--out WxH]
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
    ap.add_argument("--input", default=None, metavar="FILE")
    ap.add_argument("--output", default=None, metavar="FILE")
    ap.add_argument("--out", default=None, metavar="WxH",
                    help="output size (default: 2x the input)")
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
    # assemble input frames: real file via utils.y4m, or synthetic
    frames = []
    if args.input and args.input.endswith(".y4m"):
        from libplacebo_tpu.utils.y4m import Y4MReader
        with Y4MReader(args.input) as reader:
            frames = list(reader)
    elif args.input:
        from libplacebo_tpu.utils.y4m import read_png
        frames = [frame_from_rgb(read_png(args.input)[:3], color=CSP_SRGB)]
    else:
        for i in range(8):
            img = rng.random((144, 256, 3)).astype(np.float32)
            frames.append(frame_from_rgb(img, color=CSP_SRGB))
    in_w, in_h = frames[0].w, frames[0].h
    if args.out:
        ow, oh = map(int, args.out.split("x"))
    else:
        ow, oh = 2 * in_w, 2 * in_h
    target = Target(w=ow, h=oh, color=CSP_SRGB, bit_depth=8)

    # async processing: enqueue the batch, sync once (the reference
    # demo's async download path)
    t0 = time.perf_counter()
    outs = [renderer.render(f, target, params) for f in frames]
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"filtered {len(frames)} frames {in_w}x{in_h} -> {ow}x{oh} "
          f"(deband + EWA upscale + 3DLUT + dither) in {dt:.2f}s")
    result = np.asarray(outs[-1])
    print("output:", result.shape, "range",
          round(float(result.min()), 3), round(float(result.max()), 3))

    if args.output and args.output.endswith(".y4m"):
        # re-encode the filtered RGB to 4:2:0 YUV for the muxer
        from libplacebo_tpu.core.colorspace import (BitEncoding,
                                                    ColorLevels,
                                                    ColorRepr,
                                                    ColorSystem)
        from libplacebo_tpu.ops.color import encode_color
        from libplacebo_tpu.utils.y4m import Y4MWriter
        yuv_repr = ColorRepr(sys=ColorSystem.BT_709,
                             levels=ColorLevels.LIMITED,
                             bits=BitEncoding(8, 8, 0))
        with Y4MWriter(args.output, ow, oh, csp="420jpeg") as wr:
            for o in outs:
                yuv = np.asarray(encode_color(o, yuv_repr))
                wr.write(yuv)
        print("wrote", args.output)
    elif args.output:
        from libplacebo_tpu.utils.y4m import write_png
        write_png(args.output, result)
        print("wrote", args.output)


if __name__ == "__main__":
    main()
