#!/usr/bin/env python3
"""Multi-host (DCN) smoke test: the flagship sharded pipeline over a
2-process `jax.distributed` runtime.

SURVEY §5.8 / build-plan T8 maps the reference's multi-GPU frame
hand-off (`demos/multigpu-bench.c`) to "mesh over ICI; DCN for
multi-host with the standard JAX distributed runtime".  Real multi-host
TPU hardware is not available here, so this tool proves the *software*
side of that mapping on CPU: two OS processes, each owning 4 virtual
XLA devices, joined by `jax.distributed.initialize` with Gloo TCP
collectives — the same multi-controller runtime a TPU pod slice uses
(there the ICI/DCN transports replace Gloo; no code changes).

Mesh layout matches the production recipe: the **data axis spans
processes** (each host renders its own frames — DCN traffic is zero in
steady state) and the **spatial axis stays within a process** (halo
ppermutes ride intra-host ICI).  The single-`jit` step built by
`build_sharded_pipeline` is unchanged — multi-controller JAX runs the
identical program on every process against global arrays.

Usage:
    python tools/multihost_smoke.py            # parent: spawns 2 procs
    python tools/multihost_smoke.py --json OUT # + write artifact

Each process renders the global batch cooperatively; process 0 gathers
the sharded output and asserts exact parity with a single-chip
Renderer reference for every frame.
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = int(os.environ.get("LPTPU_MH_PORT", "19753"))


def child(pid: int) -> None:
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=N_PROC, process_id=pid)
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.ops.peak_detect import PeakDetectParams
    from libplacebo_tpu.parallel import (build_sharded_pipeline,
                                         shard_planes,
                                         sharded_state_init)
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    from tests.test_parallel import _flagship_frames

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC
    # data axis ACROSS processes (device order is process-major), the
    # spatial/halo axis within one process
    devs = np.array(jax.devices()).reshape(N_PROC, DEV_PER_PROC)
    mesh = Mesh(devs, ("data", "spatial"))

    src_h, src_w, scale = 64, 96, 2
    batch = N_PROC                       # one frame per "host"
    frames = _flagship_frames(batch, src_h, src_w, seed=42)
    f0 = frames[0]
    target = Target(w=scale * src_w, h=scale * src_h, color=CSP_SRGB,
                    bit_depth=0)
    params = RenderParams(upscaler="ewa_lanczos",
                          peak_detect=PeakDetectParams(percentile=99.5))
    step = build_sharded_pipeline(mesh, f0.meta_key()[0], f0.repr,
                                  f0.color, target, params)
    # every process supplies the full global batch; device_put slices
    # out this process's addressable shards (host-local frame IO in a
    # real deployment would use make_array_from_process_local_data)
    planes = [np.stack([np.asarray(f.planes[i].data) for f in frames])
              for i in range(len(f0.planes))]
    xs = shard_planes(mesh, planes)
    state = sharded_state_init(mesh, batch)

    t0 = time.perf_counter()
    out, new_state = step(state, *xs)
    out_g = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    dt = time.perf_counter() - t0

    # single-chip reference on this process's local device 0
    worst = 0.0
    for b, f in enumerate(frames):
        ref = np.asarray(Renderer()._render_once(f, target, params))
        worst = max(worst, float(np.abs(out_g[b] - ref).max()))
    assert worst < 1e-6, f"proc {pid}: parity {worst}"
    print(f"MH-OK proc={pid}/{jax.process_count()} "
          f"devices={len(jax.devices())} out={out_g.shape} "
          f"max|err|={worst:.2e} step={dt * 1e3:.0f}ms", flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--json", default=None, metavar="FILE")
    args = ap.parse_args()
    if args.child is not None:
        child(args.child)
        return 0

    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child", str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=REPO) for i in range(N_PROC)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    ok = all(p.returncode == 0 for p in procs) and \
        all(f"MH-OK proc={i}" in outs[i] for i in range(N_PROC))
    for i, o in enumerate(outs):
        for line in o.splitlines():
            if line.startswith("MH-OK") or not ok:
                print(f"[proc {i}] {line}")
    if args.json and ok:
        rec = {"processes": N_PROC, "devices_per_process": DEV_PER_PROC,
               "mesh": {"data": N_PROC, "spatial": DEV_PER_PROC},
               "collectives": "gloo-tcp",
               "parity": "exact vs single-chip Renderer",
               "ok": True}
        with open(args.json, "w") as f:
            json.dump(rec, f, indent=1)
        print(f"wrote {args.json}")
    print("MULTIHOST SMOKE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
