#!/usr/bin/env python3
"""plplay — minimal playback-loop demo (reference: demos/plplay.c).

Decodes synthetic frames (or YUV files via --y4m), runs them through the
frame queue with motion interpolation, and renders each vsync with the
full pipeline. Prints per-pass telemetry like plplay's on-screen stats.

Usage:
    python demos/plplay.py [--frames N] [--fps 24] [--vsync 60]
                           [--preset default|fast|high_quality]
                           [--options "upscaler=ewa_lanczos,deband=yes"]
                           [--size WxH] [--out WxH] [--hdr] [--cpu]
                           [--y4m in.y4m] [--write-y4m out.y4m]
                           [--write-png dir/]

--y4m plays a real YUV4MPEG2 file (`ffmpeg -i clip.mkv clip.y4m`)
instead of the synthetic source; --write-y4m muxes the rendered output
(renderer encodes straight to the target YUV repr, the muxer
box-averages chroma to 4:2:0); --write-png dumps per-vsync RGB stills.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--fps", type=float, default=24.0)
    ap.add_argument("--vsync", type=float, default=60.0)
    ap.add_argument("--preset", default="default")
    ap.add_argument("--options", default="")
    ap.add_argument("--size", default="640x360")
    ap.add_argument("--out", default="1280x720")
    ap.add_argument("--hdr", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--zoom", default="fit",
                    choices=["fit", "pad", "crop", "stretch", "raw"],
                    help="how the video fills the target (reference "
                         "plplay target_zoom, demos/plplay.c:404-430)")
    ap.add_argument("--rotate", type=int, default=0,
                    choices=[0, 90, 180, 270],
                    help="display rotation (reference plplay "
                         "target_rot): rotates frames before scaling")
    ap.add_argument("--par", type=float, default=0.0,
                    help="force a pixel aspect ratio on source frames "
                         "(anamorphic content)")
    ap.add_argument("--y4m", default=None, metavar="FILE",
                    help="play a YUV4MPEG2 file instead of synthesizing")
    ap.add_argument("--write-y4m", default=None, metavar="FILE",
                    help="mux rendered output as 4:2:0 YUV4MPEG2")
    ap.add_argument("--write-png", default=None, metavar="DIR",
                    help="dump rendered vsyncs as PNG stills")
    ap.add_argument("--ui", action="store_true",
                    help="live options panel (curses) during playback — "
                         "the reference demos/settings.c analog: every "
                         "option editable mid-stream, applied on the "
                         "next vsync")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB)
    from libplacebo_tpu.core.options import Options
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.profiler import Telemetry
    from libplacebo_tpu.render.queue import (FrameQueue, QueueMode,
                                             QueueParams, QueueStatus)
    from libplacebo_tpu.render.renderer import (Renderer, Target,
                                                render_image_mix)

    w, h = map(int, args.size.split("x"))
    ow, oh = map(int, args.out.split("x"))

    opts = Options()
    if args.preset != "default":
        opts.parse(f"preset={args.preset}")
    if args.options:
        opts.parse(args.options)

    # synthetic "decoder": moving gradient + noise
    rng = np.random.default_rng(0)

    def decode(i):
        yy, xx = np.mgrid[0:h, 0:w]
        phase = i / args.fps
        y = (96 + 60 * np.sin(xx / 64.0 + phase * 3)
             + 40 * np.cos(yy / 48.0 + phase * 2)
             + rng.normal(0, 2, (h, w))).clip(16, 235).astype(np.uint8)
        u = np.full((h // 2, w // 2), 128, np.uint8)
        v = (128 + 64 * np.sin(phase)).astype(np.uint8) * \
            np.ones((h // 2, w // 2), np.uint8)
        kwargs = {}
        if args.hdr:
            kwargs = dict(color=CSP_BT2100_PQ,
                          repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                                         levels=ColorLevels.LIMITED,
                                         bits=BitEncoding(8, 8, 0)))
        f = frame_from_yuv420p(y, u, v, **kwargs)
        f.pts = i / args.fps
        f.signature = i + 1
        return f

    if args.y4m:
        from libplacebo_tpu.utils.y4m import Y4MReader
        reader = Y4MReader(args.y4m)
        w, h = reader.info.width, reader.info.height
        if reader.info.fps:
            args.fps = float(reader.info.fps)

        decoded = [0]

        def y4m_frames():
            for i, f in enumerate(reader):
                f.pts = i / args.fps
                f.signature = i + 1
                decoded[0] = i + 1
                yield f
            yield None
        frames = y4m_frames()
        args.frames = 10 ** 9       # plays until the queue reports EOF
    else:
        frames = iter([decode(i) for i in range(args.frames)] + [None])
    queue = FrameQueue(QueueParams(get_frame=lambda: next(frames)))
    renderer = Renderer()
    renderer.telemetry = Telemetry()
    if args.write_y4m:
        # renderer encodes to the target's YUV repr; muxer subsamples
        target = Target(w=ow, h=oh, color=CSP_SRGB, bit_depth=8,
                        repr=ColorRepr(sys=ColorSystem.BT_709,
                                       levels=ColorLevels.LIMITED,
                                       bits=BitEncoding(8, 8, 0)))
    else:
        target = Target(w=ow, h=oh, color=CSP_SRGB, bit_depth=8)
    writer = png_dir = None
    if args.write_y4m:
        from libplacebo_tpu.utils.y4m import Y4MWriter
        fr = args.vsync
        # 420jpeg: the box-average downsample sites chroma at the
        # center, which is exactly what the jpeg tag declares
        writer = Y4MWriter(args.write_y4m, ow, oh,
                           fps=(round(fr * 1001), 1001), csp="420jpeg")
    if args.write_png:
        from libplacebo_tpu.utils.y4m import write_png
        png_dir = args.write_png
        os.makedirs(png_dir, exist_ok=True)

    n_vsyncs = min(int(args.frames / args.fps * args.vsync), 10 ** 9)
    state = {"rendered": 0, "out": None, "t0": time.perf_counter()}

    def render_vsync(vs):
        """One vsync of the playback loop; returns False at EOF.
        Reads opts.params fresh each call, so the --ui panel's edits
        take effect on the very next vsync (changed configs trace a
        new jit pipeline; unchanged ones reuse the cached one)."""
        status, mix = queue.update(
            QueueParams(pts=vs / args.vsync, radius=1.0,
                        vsync_duration=1.0 / args.vsync),
            QueueMode.INTERPOLATE)
        if status != QueueStatus.OK:
            return False
        # aspect handling (reference demos/plplay.c:404-430): stretch
        # the source crop by the pixel aspect ratio, then zoom the
        # target crop around it
        from dataclasses import replace as _replace
        from libplacebo_tpu.core.common import RectF
        ref_frame = mix.frames[0]
        if args.rotate:
            from libplacebo_tpu.core.common import Rotation
            for mf in mix.frames:
                mf.rotation = Rotation(args.rotate // 90)
        if args.par:
            ref_frame.pixel_aspect_ratio = args.par
        sar = ref_frame.pixel_aspect_ratio
        crop = ref_frame.get_crop()
        if sar and args.zoom != "raw":
            crop = crop.stretch_xy(max(1.0, sar), max(1.0, 1.0 / sar))
        if args.rotate:
            # zoom math sees the displayed (rotated) aspect (reference
            # plplay.c:411 pl_rect2df_rotate)
            from libplacebo_tpu.core.common import Rotation
            crop = crop.rotate(Rotation(args.rotate // 90)).normalized()
        full = RectF(0, 0, ow, oh)
        if args.zoom == "pad":
            tcrop = full.aspect_copy(crop, 0.0)
        elif args.zoom == "crop":
            tcrop = full.aspect_copy(crop, 1.0)
        elif args.zoom == "fit":
            tcrop = full.aspect_fit(crop, 0.0)
        elif args.zoom == "raw":
            tcrop = RectF(0, 0, crop.w, crop.h)
        else:                    # stretch: full target
            tcrop = full
        vt = target if tcrop == full else _replace(target, crop=tcrop)
        out = render_image_mix(renderer, mix, vt, opts.params)
        if writer is not None:
            writer.write(np.asarray(out))
        if png_dir is not None:
            from libplacebo_tpu.utils.y4m import write_png
            write_png(os.path.join(png_dir, f"vsync{vs:05d}.png"),
                      np.asarray(out))
        state["out"] = out
        state["rendered"] += 1
        return True

    if args.ui:
        # live options panel (reference demos/settings.c): options
        # edited in the panel land in opts.params, which render_vsync
        # reads per vsync
        try:
            from demos.settings_ui import SettingsPanel, run_curses
        except ImportError:          # run as a bare script
            from settings_ui import SettingsPanel, run_curses
        panel = SettingsPanel(opts)
        counter = iter(range(n_vsyncs))

        def tick():
            vs = next(counter, None)
            if vs is None:
                return None
            # interactive mode paces to the real vsync clock (the
            # non-UI loop free-runs for benchmarking); a late frame
            # renders immediately
            lag = state["t0"] + vs / args.vsync - time.perf_counter()
            if lag > 0:
                time.sleep(lag)
            if not render_vsync(vs):
                return None
            dt = time.perf_counter() - state["t0"]
            return (f"plplay {w}x{h}@{args.fps} -> {ow}x{oh}"
                    f"@{args.vsync}  vsync {vs}  "
                    f"{state['rendered'] / dt:.1f} fps")
        run_curses(panel, tick)
    else:
        for vs in range(n_vsyncs):
            if not render_vsync(vs):
                break
    out = state["out"]
    rendered = state["rendered"]
    out.block_until_ready()
    if writer is not None:
        writer.close()
    renderer.flush_telemetry()   # telemetry records one frame late
    dt = time.perf_counter() - state["t0"]

    n_src = decoded[0] if args.y4m else args.frames
    print(f"played {rendered} vsyncs ({n_src} source frames) "
          f"in {dt:.2f}s = {rendered / dt:.1f} fps")
    print(f"source {w}x{h} @ {args.fps} fps -> {ow}x{oh} @ {args.vsync} Hz"
          f"{' (HDR PQ->SDR)' if args.hdr else ''}")
    print("options:", opts.save() or "(defaults)")


if __name__ == "__main__":
    main()
