#!/usr/bin/env python3
"""multichip-bench — multi-device frame pipeline benchmark (reference:
demos/multigpu-bench.c, which measures cross-GPU frame transfer paths).

The TPU equivalent measures the FULL renderer sharded over a
('data','spatial') mesh (parallel/renderer.py): YUV merge -> decode ->
EWA-Jinc scale [ppermute halo] -> peak histogram [psum] -> tone ->
gamut -> encode -> dither, per mesh shape.  On a single-chip host it
runs on virtual CPU devices (--virtual 8).

Usage: python demos/multichip_bench.py [--virtual N] [--size WxH]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--size", default="512x288")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB)
    from libplacebo_tpu.ops.peak_detect import PeakDetectParams
    from libplacebo_tpu.parallel import (build_sharded_pipeline, make_mesh,
                                         shard_planes, sharded_state_init)
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import RenderParams, Target

    devices = jax.devices()
    n = len(devices)
    print(f"devices: {n} x {devices[0].device_kind}")
    w, h = map(int, args.size.split("x"))

    if n >= 8:
        configs = [(1, 8), (2, 4), (4, 2), (8, 1)]
    elif n >= 2:
        configs = [(1, n), (n, 1)]
    else:
        configs = [(1, 1)]

    rng = np.random.default_rng(0)
    for data, spatial in configs:
        mesh = make_mesh(data=data, spatial=spatial,
                         devices=devices[:data * spatial])
        # round the row count so every shard gets whole 16-row tiles
        quantum = max(spatial * 32, 32)
        sh = (h + quantum - 1) // quantum * quantum
        batch = 2 * data

        frames = []
        for _ in range(batch):
            y = (rng.random((sh, w)) * 219 + 16).astype(np.uint8)
            u = (rng.random((sh // 2, w // 2)) * 224 + 16).astype(np.uint8)
            v = (rng.random((sh // 2, w // 2)) * 224 + 16).astype(np.uint8)
            frames.append(frame_from_yuv420p(
                y, u, v, color=CSP_BT2100_PQ,
                repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                               levels=ColorLevels.LIMITED,
                               bits=BitEncoding(8, 8, 0))))

        target = Target(w=2 * w, h=2 * sh, color=CSP_SRGB, bit_depth=8)
        params = RenderParams(upscaler="ewa_lanczos",
                              peak_detect=PeakDetectParams(percentile=99.5))
        f0 = frames[0]
        step = build_sharded_pipeline(mesh, f0.meta_key()[0], f0.repr,
                                      f0.color, target, params)
        planes = [np.stack([np.asarray(f.planes[i].data) for f in frames])
                  for i in range(len(f0.planes))]
        xs = shard_planes(mesh, planes)
        state = sharded_state_init(mesh, batch)

        out, state2 = step(state, *xs)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, state2 = step(state2, *xs)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        fps = batch / dt
        print(f"mesh data={data} spatial={spatial}: "
              f"{dt * 1e3:7.2f} ms/batch = {fps:7.1f} frames/s "
              f"({sh}x{w} -> {2 * sh}x{2 * w}, full pipeline)")


if __name__ == "__main__":
    main()
