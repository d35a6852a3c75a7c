"""System-level playback benchmark: sustained fps INCLUDING live
host->device ingestion (VERDICT r4 weak #6 / do #7).

The headline bench (bench.py) measures the on-device pipeline with a
chained on-device loop — no per-frame host traffic.  Real playback
additionally pays a per-frame host->device upload through the axon TPU
tunnel, whose throughput is an ENVIRONMENT property (orders of
magnitude below a datacenter host's DMA, and varying run to run — see
CLAUDE.md).  This tool measures the end-to-end number honestly, in ONE
process, for u8 yuv420p and p010le 1080p sources, and proves the
upload/render overlap machinery end-to-end:

  upload   pipelined ingestion alone: dispatch every frame's
           device_put + device-norm jit, then drain (sustained
           transfer throughput, the ingest ceiling)
  render   per-frame render dispatch of one pre-uploaded frame with a
           2-frame in-flight window (the pipeline ceiling seen through
           per-frame host dispatch, vs bench.py's chained loop)
  serial   upload -> force -> render -> force, fully serialized per
           frame (no overlap possible)
  queue    the plplay path: the real FrameQueue pulls get_frame()
           PREFETCH_FRAMES=2 ahead of the display window, so the next
           frames' uploads are dispatched while the current frame
           renders; outputs are fetched with a 2-frame lag
           (double-buffered display)

Done-criterion from the r4 review: the README can cite "on-device
pipeline fps" and "ingest-inclusive fps in this environment"
separately, both measured, and the overlap machinery (P5) is proven
end-to-end rather than asserted: queue-mode fps > serial fps, and
queue-mode approaches min(upload, render) — the slower stage hides the
faster one.

NB: upload numbers are NOT comparable across processes (the tunnel's
transfer throughput varies ~10x between processes); the serial-vs-queue
delta WITHIN this process is the meaningful overlap evidence.

Reference analog: pl_gpu's async transfer machinery (gpu.h:879-896,
pl_tex_transfer_params.callback) + plplay's decode-ahead loop and
pl_queue prefetch (frame_queue.c:62).

Usage:
    python tools/bench_playback.py [--frames N] [--out PLAYBACK_r05.json]
"""
import argparse
import json
import os
import sys
import time
from collections import deque

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 1080, 1920
SRC_FPS = 24.0
LAG = 2                      # in-flight display window (double-buffer)


def make_host_frames(fmt: str, n: int):
    """n DISTINCT host arrays per plane (np.roll copies), so every
    frame pays a real host->device transfer."""
    rng = np.random.default_rng(11)
    if fmt == "yuv420p":
        base = [
            (rng.random((H, W)) * 219 + 16).astype(np.uint8),
            (rng.random((H // 2, W // 2)) * 224 + 16).astype(np.uint8),
            (rng.random((H // 2, W // 2)) * 224 + 16).astype(np.uint8),
        ]
    elif fmt == "p010le":
        # MSB-aligned 10-bit (ffmpeg p010): samples in the top bits
        base = [
            ((rng.random((H, W)) * 876 + 64).astype(np.uint16) << 6),
            ((rng.random((H // 2, W // 2, 2)) * 896 + 64)
             .astype(np.uint16) << 6),
        ]
    else:
        raise ValueError(fmt)
    return [[np.roll(p, 7 * i, axis=1) for p in base] for i in range(n)]


def ingest(fmt: str, data, pts: float = 0.0):
    """The real FFmpeg-interop ingestion path (device-norm uploads:
    raw integer texels + cached normalize jits)."""
    from libplacebo_tpu.utils.interop import frame_from_avframe_like
    f = frame_from_avframe_like({
        "format": fmt, "data": data, "colorspace": "bt2020nc",
        "color_trc": "smpte2084", "color_range": "tv"})
    f.pts = pts
    return f


def force_frame(f):
    """Force upload + normalize completion (the axon tunnel is lazy:
    block_until_ready does not reliably execute; a scalar fetch does)."""
    for p in f.planes:
        float(p.data.ravel()[0])


def force_out(out):
    float(out.ravel()[0])


def _flagship():
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    target = Target(w=3840, h=2160, color=CSP_SRGB, bit_depth=8)
    params = RenderParams(upscaler="ewa_lanczos")
    return Renderer(), target, params


def run_upload(fmt, host_frames):
    frames = [ingest(fmt, d) for d in host_frames]
    for f in frames:
        force_frame(f)
    return frames


def run_render_only(frame, r, target, params, n):
    pending = deque()
    for _ in range(n):
        pending.append(r.render(frame, target, params))
        while len(pending) > LAG:
            force_out(pending.popleft())
    while pending:
        force_out(pending.popleft())


def run_serial(fmt, host_frames, r, target, params):
    for d in host_frames:
        f = ingest(fmt, d)
        force_frame(f)
        force_out(r.render(f, target, params))


def run_queue(fmt, host_frames, r, target, params):
    """plplay-shaped loop: FrameQueue + get_frame prefetch + lagged
    display fetch.  Prefetch dispatches uploads 2 frames ahead; the
    LAG-frame output window keeps the render of frame i in flight
    while frame i+1..i+2 upload."""
    from libplacebo_tpu.render.queue import (FrameQueue, QueueMode,
                                             QueueParams, QueueStatus)
    n = len(host_frames)
    counter = iter(range(n))

    def get_frame():
        i = next(counter, None)
        if i is None:
            return None
        return ingest(fmt, host_frames[i], pts=i / SRC_FPS)

    q = FrameQueue(QueueParams(get_frame=get_frame))
    pending = deque()
    emitted = 0
    for i in range(n):
        st, mix = q.update(QueueParams(pts=i / SRC_FPS,
                                       get_frame=get_frame),
                           mode=QueueMode.NEAREST)
        if st != QueueStatus.OK or mix is None or not mix.frames:
            break
        pending.append(r.render(mix.frames[0], target, params))
        emitted += 1
        while len(pending) > LAG:
            force_out(pending.popleft())
    while pending:
        force_out(pending.popleft())
    return emitted


def timed(fn, *args):
    t0 = time.perf_counter()
    ret = fn(*args)
    return time.perf_counter() - t0, ret


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (logic smoke test only "
                         "— numbers are meaningless off the TPU)")
    args = ap.parse_args()
    n = args.frames

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from libplacebo_tpu.core.cache import set_xla_cache_dir
        set_xla_cache_dir(os.path.join(REPO, ".xla_cache"))

    r, target, params = _flagship()
    result = {"frames": n, "src": [H, W], "dst": [target.w, target.h],
              "lag": LAG, "prefetch": 2, "formats": {}}
    for fmt in ("yuv420p", "p010le"):
        host = make_host_frames(fmt, n)

        # warmup: compile the pipeline + device-norm jits for this
        # format's meta, and absorb the tunnel's cold-fetch RTT
        f0 = ingest(fmt, host[0])
        force_frame(f0)
        force_out(r.render(f0, target, params))

        dt_up, frames = timed(run_upload, fmt, host)
        dt_rd, _ = timed(run_render_only, frames[0], r, target, params, n)
        del frames
        dt_se, _ = timed(run_serial, fmt, host, r, target, params)
        dt_qu, emitted = timed(run_queue, fmt, host, r, target, params)
        assert emitted == n, (emitted, n)

        fps = {k: round(n / dt, 2) for k, dt in
               [("upload", dt_up), ("render_dispatch", dt_rd),
                ("serial", dt_se), ("queue_overlap", dt_qu)]}
        ms = {k: round(1000 * dt / n, 1) for k, dt in
              [("upload", dt_up), ("render_dispatch", dt_rd),
               ("serial", dt_se), ("queue_overlap", dt_qu)]}
        # overlap evidence: queue time vs the no-overlap sum and the
        # slower-stage floor, within this one process
        overlap = {
            "speedup_vs_serial": round(dt_se / dt_qu, 2),
            "frac_of_no_overlap_sum": round(dt_qu / (dt_up + dt_rd), 2),
            "frac_of_slower_stage": round(dt_qu / max(dt_up, dt_rd), 2),
        }
        result["formats"][fmt] = {"fps": fps, "ms_per_frame": ms,
                                  "overlap": overlap}
        print(json.dumps({fmt: result["formats"][fmt]}), flush=True)

    result["note"] = (
        "axon-tunnel ingest throughput is an environment property and "
        "varies ~10x between processes; compare modes within this "
        "artifact only.  bench.py's chained number is the on-device "
        "pipeline fps; 'queue_overlap' is the ingest-inclusive fps in "
        "this environment.")
    if args.out:
        with open(args.out, "w") as fjson:
            json.dump(result, fjson, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
