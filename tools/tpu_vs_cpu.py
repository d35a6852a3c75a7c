"""TPU-vs-CPU end-to-end parity check (the CLAUDE.md color-chain gate).

Renders identical stress frames (smooth luma ramp + extreme random
chroma — saturates the gamut-mapping predicate edges harder than any
natural content) through the full Renderer on both backends in separate
processes, then reports max diff, frac>1e-3 and PSNR.

Run after ANY change to the color chain:

    python tools/tpu_vs_cpu.py                  # hq + separable presets
    python tools/tpu_vs_cpu.py --size 96x160    # quicker spot check

Targets (CLAUDE.md): PSNR >= 45 dB; frac>1e-3 below ~1% (the residue is
fully-saturated out-of-gamut pixels landing on opposite sides of the
softclip predicate edges — the reference's coarse LUT sampling smooths
the same singular surface).
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _stress_yuv(h, w, seed):
    """Smooth luma, extreme random chroma: worst case for the gamut
    predicate edges while keeping the scaler well-behaved."""
    rng = np.random.default_rng(seed)
    yy = np.linspace(0.1, 0.95, h)[:, None] * np.ones((1, w))
    y = (yy * 219 + 16).astype(np.uint8)
    u = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    v = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    return y, u, v


def render_one(backend, preset, h, w, seed, out_path):
    import jax
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from libplacebo_tpu.core.cache import set_xla_cache_dir
    set_xla_cache_dir(os.path.join(REPO, ".xla_cache"))
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ, CSP_SRGB)
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import (HIGH_QUALITY_PARAMS,
                                                RenderParams, Renderer,
                                                Target)
    y, u, v = _stress_yuv(h, w, seed)
    frame = frame_from_yuv420p(
        y, u, v, color=CSP_BT2100_PQ,
        repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                       levels=ColorLevels.LIMITED,
                       bits=BitEncoding(8, 8, 0)))
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)
    params = HIGH_QUALITY_PARAMS if preset == "hq" else \
        RenderParams(upscaler="lanczos")
    out = np.asarray(Renderer()._render_once(frame, target, params))
    np.save(out_path, out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="128x224",
                    help="source HxW (default 128x224)")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--presets", default="hq,sep")
    ap.add_argument("--_render", nargs=5, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args._render:
        backend, preset, h, w, out_path = args._render
        render_one(backend, preset, int(h), int(w), args.seed, out_path)
        return

    h, w = (int(t) for t in args.size.split("x"))
    failed = False
    for preset in args.presets.split(","):
        outs = {}
        for backend in ("cpu", "tpu"):
            fd, path = tempfile.mkstemp(suffix=".npy")
            os.close(fd)
            env = dict(os.environ)
            subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--seed", str(args.seed),
                 "--_render", backend, preset, str(h), str(w), path],
                check=True, env=env, cwd=REPO)
            outs[backend] = np.load(path)
            os.unlink(path)
        diff = np.abs(outs["cpu"] - outs["tpu"])
        mse = float((diff.astype(np.float64) ** 2).mean())
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        frac = float((diff > 1e-3).mean())
        line = {"preset": preset, "max": round(float(diff.max()), 5),
                "frac_gt_1e3": round(frac, 5), "psnr_db": round(psnr, 1)}
        print(json.dumps(line))
        if psnr < 45.0 or frac > 0.01:
            failed = True
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
