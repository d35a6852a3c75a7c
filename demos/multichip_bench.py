#!/usr/bin/env python3
"""multichip-bench — multi-device frame pipeline benchmark (reference:
demos/multigpu-bench.c, which measures cross-GPU frame transfer paths).

The TPU equivalent measures the spatially-sharded render step: frames
sharded over a ('data','spatial') mesh with ppermute halo exchange.
On a single-chip host it runs on virtual CPU devices (--virtual 8).

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

    import os
    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") +
            f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from libplacebo_tpu.parallel import (make_mesh, shard_frame_batch,
                                         sharded_render_step)

    devices = jax.devices()
    n = len(devices)
    print(f"devices: {n} x {devices[0].device_kind}")
    w, h = map(int, args.size.split("x"))

    configs = []
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
        sh = h - h % max(spatial * 16, 16) + max(spatial * 16, 16)
        step = sharded_render_step(mesh, sh, w, 2 * sh, 2 * w)
        batch = rng.random((max(data, 1) * 2, 3, sh, w)).astype(np.float32)
        x = shard_frame_batch(mesh, jnp.asarray(batch))
        out = step(x)
        out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / args.iters
        fps = batch.shape[0] / dt
        print(f"mesh data={data} spatial={spatial}: "
              f"{dt * 1e3:7.2f} ms/batch = {fps:7.1f} frames/s "
              f"({sh}x{w} -> {2 * sh}x{2 * w})")


if __name__ == "__main__":
    main()
