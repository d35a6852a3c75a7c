#!/usr/bin/env python3
"""Micro-benchmark suite mirroring the reference's pass list
(src/tests/bench.c:514-560): every shader routine timed standalone at
1920x1080 float32, plus host<->device transfer paths.

Each op is timed with a serialized on-device chain (fori_loop feeding a
perturbation of the output back into the input) so dispatch and fetch
overhead cancel — the analog of the reference's 128-iteration pl_timer
averages.

Usage:
    python tools/bench_micro.py                 # real TPU, 1080p
    python tools/bench_micro.py --cpu --size 192x128 --n 2   # smoke
    python tools/bench_micro.py --passes polar,deband --json out.json
Pass --ed to include error diffusion (long Mosaic compile at full res).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, arg, n, results):
    """Chained-loop timing; prints one line and records ms."""
    import jax
    import jax.numpy as jnp

    try:
        def chained(x):
            out = fn(x)
            ref = out[0] if isinstance(out, tuple) else out

            def body(i, carry):
                o = fn(x + carry.ravel()[0] * 1e-12)
                return (o[0] if isinstance(o, tuple)
                        else o).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, ref.astype(jnp.float32))

        jc = jax.jit(chained)
        out = jc(arg)
        _ = float(out.ravel()[0])          # force (tunnel is lazy)
        t0 = time.perf_counter()
        out = jc(arg)
        _ = float(out.ravel()[0])
        dt = (time.perf_counter() - t0) / (n + 1)
        print(f"{name:28s} {dt * 1e3:9.3f} ms", flush=True)
        results[name] = dt * 1e3
    except Exception as e:                          # noqa: BLE001
        print(f"{name:28s}      SKIP ({type(e).__name__}: {e})",
              flush=True)
        results[name] = None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--size", default="1920x1080", metavar="WxH")
    ap.add_argument("--n", type=int, default=30,
                    help="chained iterations per op")
    ap.add_argument("--passes", default=None,
                    help="comma-separated substring filter")
    ap.add_argument("--ed", action="store_true",
                    help="include error diffusion (slow compile)")
    ap.add_argument("--json", default=None, metavar="FILE")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from libplacebo_tpu.core import tone_mapping as tm
    from libplacebo_tpu.core import filters as flt
    from libplacebo_tpu.core.colorspace import (CSP_BT2100_PQ, ColorPrimaries,
                                                HdrScaling, primaries_get)
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.core.film_grain import (AV1GrainData, FilmGrainData,
                                                H274GrainData)
    from libplacebo_tpu.ops import color as ops_color
    from libplacebo_tpu.ops import deband as ops_deband
    from libplacebo_tpu.ops import deinterlace as ops_di
    from libplacebo_tpu.ops import dithering as ops_dither
    from libplacebo_tpu.ops import dovi as ops_dovi
    from libplacebo_tpu.ops import film_grain as ops_fg
    from libplacebo_tpu.ops import film_grain_h274 as ops_h274
    from libplacebo_tpu.ops import gamut as ops_gamut
    from libplacebo_tpu.ops import peak_detect as ops_peak
    from libplacebo_tpu.ops import polar as ops_polar
    from libplacebo_tpu.ops import sampling as ops_samp

    W, H = (int(v) for v in args.size.lower().split("x"))
    n = args.n
    results = {}
    want = (args.passes.split(",") if args.passes else None)

    def sel(name):
        return want is None or any(w in name for w in want)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, H, W), np.float32))
    img1 = img[:1]
    print(f"# {jax.devices()[0].platform} {W}x{H} n={n}", flush=True)

    # --- host<->device transfers (bench.c:458-497) -----------------------
    host = np.asarray(rng.random((3, H, W), np.float32))
    if sel("tex_upload"):
        try:
            for name, k in (("tex_upload ptr", 1),
                            ("tex_upload ptr async", 8)):
                dev = jax.device_put(host)
                jax.block_until_ready(dev)          # warm
                # distinct pre-built host arrays: the tunnel may dedup
                # repeated buffers, and building them must not be timed
                hosts = [host + np.float32(i) for i in range(k)]
                t0 = time.perf_counter()
                devs = [jax.device_put(h) for h in hosts]
                # block_until_ready is not a reliable barrier on the
                # lazy tunnel — force each upload with a scalar fetch
                # (same barrier the device-norm passes use)
                for d in devs:
                    _ = float(d.ravel()[0])
                dt = (time.perf_counter() - t0) / k
                gbps = host.nbytes / dt / 1e9
                print(f"{name:28s} {dt * 1e3:9.3f} ms  ({gbps:.2f} GB/s)",
                      flush=True)
                results[name] = dt * 1e3
        except Exception as e:                      # noqa: BLE001
            print(f"tex_upload                   SKIP ({e})")
    if sel("tex_upload"):
        # raw-integer ingestion (r4): uint8/uint16 texels upload as-is
        # (4x/2x fewer link bytes) and normalize on device
        from libplacebo_tpu.utils import upload as up
        host_u8 = np.asarray(
            rng.integers(0, 256, (H, W, 3)).astype(np.uint8))
        host_u16 = np.asarray(
            rng.integers(0, 1 << 16, (H, W, 3)).astype(np.uint16))
        for name, harr, kw in (
                ("tex_upload u8 device-norm", host_u8, {}),
                ("tex_upload p010 device-norm", host_u16,
                 dict(bit_depth=10, bit_shift=6))):
            try:
                p = up.upload_plane(up.PlaneData(harr, (0, 1, 2), **kw))
                _ = float(p.data.ravel()[0])        # warm + force
                t0 = time.perf_counter()
                p = up.upload_plane(up.PlaneData(harr, (0, 1, 2), **kw))
                _ = float(p.data.ravel()[0])
                dt = time.perf_counter() - t0
                gbps = harr.nbytes / dt / 1e9
                print(f"{name:28s} {dt * 1e3:9.3f} ms  ({gbps:.2f} GB/s "
                      "raw)", flush=True)
                results[name] = dt * 1e3
            except Exception as e:                  # noqa: BLE001
                print(f"{name:28s}      SKIP ({e})")
    if sel("tex_download"):
        try:
            # a jax.Array caches its host copy after the first
            # np.asarray — download must fetch a FRESH device result
            # each time or it measures a host memcpy
            fn = jax.jit(lambda x, s: x + s)
            dev = fn(jax.device_put(host), np.float32(0))
            _ = np.asarray(dev)                     # warm path
            dev = fn(jax.device_put(host), np.float32(1))
            # force execution WITHOUT populating dev's host cache (the
            # tunnel is lazy; a scalar fetch of a separate tiny result
            # is the reliable barrier)
            _ = float(dev.ravel()[0])
            t0 = time.perf_counter()
            _ = np.asarray(dev)
            dt = time.perf_counter() - t0
            gbps = host.nbytes / dt / 1e9
            print(f"{'tex_download ptr':28s} {dt * 1e3:9.3f} ms  "
                  f"({gbps:.2f} GB/s)", flush=True)
            results["tex_download ptr"] = dt * 1e3
        except Exception as e:                      # noqa: BLE001
            print(f"tex_download                 SKIP ({e})")

    # --- samplers (bench.c:205-223,249-268): src -> same-size target,
    # quarter-texel offset so nothing collapses to a copy ----------------
    rect = RectF(0.25, 0.25, W + 0.25, H + 0.25)
    if sel("bilinear"):
        timeit("bilinear", lambda x: ops_samp.sample_bilinear(
            x, H, W, rect), img, n, results)
    for name in ("bicubic", "hermite", "gaussian"):
        if not sel(name):
            continue
        cfg = flt.find_filter_config(name)
        timeit(name, lambda x, c=cfg: ops_samp.resize_separable(
            x, H, W, c, rect), img, n, results)
    if sel("lanczos"):
        # the default-class separable scaler, up AND down (VERDICT r4
        # #5-weak: a regression in sample_ortho's banded-MXU path was
        # previously invisible), plus the r5 separable anti-ringing pass
        lcz = flt.find_filter_config("lanczos")
        up_rect = RectF(0.25, 0.25, W // 2 + 0.25, H // 2 + 0.25)
        timeit("lanczos_up (separable 2x)",
               lambda x: ops_samp.resize_separable(
                   x, H, W, lcz, up_rect), img, n, results)
        timeit("lanczos_up_antiring",
               lambda x: ops_samp.resize_separable(
                   x, H, W, lcz, up_rect, antiring=0.8), img, n, results)
        timeit("lanczos_down (separable 2x)",
               lambda x: ops_samp.resize_separable(
                   x, H // 2, W // 2, lcz, rect), img, n, results)
    if sel("oversample"):
        timeit("oversample", lambda x: ops_samp.sample_oversample(
            x, H, W, rect), img, n, results)
    if sel("polar"):
        ewa = flt.find_filter_config("ewa_lanczos")
        timeit("polar (ewa_lanczos)", lambda x: ops_polar.sample_polar(
            x, ewa, H, W, rect), img, n, results)
        # the reference's second variant exercises its non-compute
        # fallback; ours is the phased path forced by anti-ringing
        timeit("polar antiring", lambda x: ops_polar.sample_polar(
            x, ewa, H, W, rect, antiring=0.8), img, n, results)

    # --- deband (bench.c:190-203) ----------------------------------------
    if sel("deband"):
        timeit("deband", lambda x: ops_deband.deband(x), img1, n, results)
        heavy = ops_deband.DebandParams(iterations=4, threshold=4.0,
                                        radius=4.0, grain=16.0)
        timeit("deband_heavy", lambda x: ops_deband.deband(
            x, heavy), img1, n, results)

    # --- deinterlacers (bench.c:314-364) ---------------------------------
    prev = jnp.asarray(rng.random((3, H, W), np.float32))
    nxt = jnp.asarray(rng.random((3, H, W), np.float32))
    for algo in ("weave", "bob", "yadif", "bwdif"):
        if not sel(algo):
            continue
        p = ops_di.DeinterlaceParams(algo=ops_di.DeinterlaceAlgo(algo))
        timeit(algo, lambda x, p=p: ops_di.deinterlace(
            x, ops_di.Field.TOP, p, prev=prev, next=nxt), img, n, results)

    # --- dithering (bench.c:225-247) -------------------------------------
    from libplacebo_tpu.core.dither import DitherMethod
    for name, method in (("dither_blue", DitherMethod.BLUE_NOISE),
                         ("dither_white", DitherMethod.WHITE_NOISE),
                         ("dither_ordered_fixed",
                          DitherMethod.ORDERED_FIXED)):
        if not sel(name):
            continue
        dp = ops_dither.DitherParams(method=method)
        timeit(name, lambda x, dp=dp: ops_dither.dither(
            x, 8, dp), img, n, results)
    if args.ed and sel("error_diffusion"):
        timeit("error_diffusion (FS)", lambda x: ops_dither.error_diffusion(
            x, 8), img, n, results)
        from libplacebo_tpu.core.dither import find_error_diffusion_kernel
        jjn = find_error_diffusion_kernel("jarvis-judice-ninke")
        timeit("error_diffusion (JJN)",
               lambda x: ops_dither.error_diffusion(x, 8, jjn),
               img, n, results)

    # --- HDR peak detect + color map (bench.c:270-312) --------------------
    state = ops_peak.peak_detect_state_init()
    if sel("hdr_peak"):
        timeit("hdr_peakdetect", lambda x: ops_peak.detect_peak(
            x * 2.0, state, ops_peak.PeakDetectParams())[2],
            img, n, results)
        timeit("hdr_peakdetect_hq", lambda x: ops_peak.detect_peak(
            x * 2.0, state,
            ops_peak.PeakDetectParams(percentile=99.995))[2],
            img, n, results)
    if sel("hdr_lut") or sel("hdr_clip"):
        NORM = 203.0 / 10000.0
        b_src = ops_gamut.ipt_space(primaries_get(ColorPrimaries.BT_2020),
                                    0.0, 0.58)
        b_dst = ops_gamut.ipt_space(primaries_get(ColorPrimaries.BT_709),
                                    0.0, 0.58)
        fun = tm.find_tone_map_function("spline")
        tp = tm.ToneMapParams(function=fun, input_scaling=HdrScaling.PQ,
                              output_scaling=HdrScaling.PQ, lut_size=256,
                              input_min=0.0, input_max=0.82,
                              output_min=0.0, output_max=0.58)
        tone = lambda x: tm.apply_device(x, tp)     # noqa: E731
        if sel("hdr_lut"):
            timeit("hdr_lut (spline tone)",
                   lambda x: ops_gamut.color_map_ipt(
                       x * 2.0, tone, None, b_src, b_dst, to_norm=NORM),
                   img, n, results)
        if sel("hdr_clip"):
            timeit("hdr_clip", lambda x: ops_gamut.color_map_ipt(
                x * 2.0, None, "clip", b_src, b_dst, to_norm=NORM),
                img, n, results)

    # --- film grain (bench.c:366-416) -------------------------------------
    grain = AV1GrainData(
        num_points_y=6,
        points_y=((0, 4), (20, 5), (39, 5), (59, 5), (78, 5), (255, 40)),
        chroma_scaling_from_luma=False, num_points_uv=(2, 2),
        points_uv=(((0, 8), (255, 18)), ((0, 6), (255, 14))),
        scaling_shift=11, ar_coeff_lag=3,
        ar_coeffs_y=tuple(int(v) for v in
                          np.random.default_rng(5).integers(-30, 30, 24)),
        ar_coeffs_uv=(
            tuple(int(v) for v in
                  np.random.default_rng(6).integers(-20, 20, 25)),
            tuple(int(v) for v in
                  np.random.default_rng(7).integers(-20, 20, 25))),
        ar_coeff_shift=7, grain_scale_shift=0,
        uv_mult=(64, 64), uv_mult_luma=(32, 32), uv_offset=(0, 0),
        overlap=True)
    fgdata = FilmGrainData(type="av1", seed=7391, av1=grain)
    if sel("av1_grain"):
        cfg = ops_fg.grain_cfg_for(fgdata, (0,))
        tables = ops_fg.prepare_av1_grain(fgdata, cfg, H, W)
        timeit("av1_grain (luma)", lambda x: ops_fg.apply_av1_grain(
            x, tables, cfg, grain.scaling_shift), img1, n, results)
        cfg_uv = ops_fg.grain_cfg_for(fgdata, (0, 1, 2))
        tab_uv = ops_fg.prepare_av1_grain(fgdata, cfg_uv, H, W)
        timeit("av1_grain (3 planes)", lambda x: ops_fg.apply_av1_grain(
            x, tab_uv, cfg_uv, grain.scaling_shift), img, n, results)
        # reference pairs av1_grain (no overlap) with av1_grain_lap
        # (overlap, bench.c:383-398); our base data has overlap=True so
        # the explicit variant here is the NO-overlap one
        from dataclasses import replace as _dc_replace
        fg_nolap = FilmGrainData(
            type="av1", seed=7391,
            av1=_dc_replace(grain, overlap=False))
        cfg_nl = ops_fg.grain_cfg_for(fg_nolap, (0, 1, 2))
        tab_nl = ops_fg.prepare_av1_grain(fg_nolap, cfg_nl, H, W)
        timeit("av1_grain_nolap (3 planes)",
               lambda x: ops_fg.apply_av1_grain(
                   x, tab_nl, cfg_nl, grain.scaling_shift),
               img, n, results)
    if sel("h274_grain"):
        h274 = H274GrainData(
            model_id=0, blending_mode_id=0, log2_scale_factor=2,
            component_model_present=(True, False, False),
            num_intensity_intervals=(2, 0, 0), num_model_values=(3, 0, 0),
            intensity_interval_lower_bound=((0, 128), (), ()),
            intensity_interval_upper_bound=((127, 255), (), ()),
            comp_model_value=(((100, 8, 8), (60, 10, 6)), (), ()))
        hdata = FilmGrainData(type="h274", seed=1234, h274=h274)
        timeit("h274_grain", lambda x: ops_h274.apply_h274_grain(
            x, hdata, (0,)), img1, n, results)
        # reference benches h274 on 3 components (bench.c:401-414)
        timeit("h274_grain (3 planes)",
               lambda x: ops_h274.apply_h274_grain(x, hdata, (0, 1, 2)),
               img, n, results)

    # --- Dolby Vision reshaping (bench.c:418-456) --------------------------
    from libplacebo_tpu.core.colorspace import DoviMetadata
    poly = dict(num_pivots=9,
                pivots=tuple(np.linspace(0.0, 1.0, 9)),
                method=(0,) * 8,
                poly_coeffs=tuple((0.05, 0.9, 0.05) for _ in range(8)),
                mmr_order=(1,) * 8, mmr_constant=(0.0,) * 8,
                mmr_coeffs=tuple((((0.0,) * 7,)) for _ in range(8)))
    ident = dict(num_pivots=2, pivots=(0.0, 1.0), method=(0,),
                 poly_coeffs=((0.0, 1.0, 0.0),), mmr_order=(1,),
                 mmr_constant=(0.0,), mmr_coeffs=(((0.0,) * 7,),))
    mmr = dict(num_pivots=2, pivots=(0.0, 1.0), method=(1,),
               poly_coeffs=((0, 0, 0),), mmr_order=(3,),
               mmr_constant=(0.1,),
               mmr_coeffs=((tuple(0.02 * i for i in range(7)),
                            tuple(0.01 * i for i in range(7)),
                            tuple(0.005 * i for i in range(7))),))
    if sel("reshape_poly"):
        packed = ops_dovi.pack_dovi(DoviMetadata(comp=(poly, ident, ident)))
        timeit("reshape_poly", lambda x: ops_dovi.dovi_reshape_packed(
            x, packed), img, n, results)
    if sel("reshape_mmr"):
        packed = ops_dovi.pack_dovi(DoviMetadata(comp=(mmr, ident, ident)))
        timeit("reshape_mmr", lambda x: ops_dovi.dovi_reshape_packed(
            x, packed), img, n, results)

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"size": [W, H], "n": n,
                       "platform": jax.devices()[0].platform,
                       "passes": results}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
