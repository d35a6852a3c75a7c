#!/usr/bin/env python
"""One-option-at-a-time sharded-vs-single-chip parity sweep.

The randomized differential sweeps (tests/test_parallel.py,
tools/tpu_vs_cpu.py --random) sample option COMBINATIONS — strong
against interaction bugs, but a rarely-sampled key can hide for rounds
(the r5 sweep caught `visualize_lut` drawing one debug view PER ROW
SHARD only because the seed happened to pick it).  This tool closes
that hole exhaustively: EVERY key in the reflection table is exercised
at a non-default value (bools flipped, numerics mid-range, enums at
representative — or with --full, all — non-default choices), rendered
through build_sharded_pipeline on the 8-virtual-device CPU mesh and
compared against the single-chip Renderer.

`--pairs N` samples N random PAIRS of keys, both at non-default values
(uniform over the same probe values as the single sweep) — the
structured middle ground between one-at-a-time (misses interactions)
and the 5-key random combos (rarely samples a *given* pair).  Keys
whose probe values come out empty (numeric default == both probes)
never pair.

Exclusions (documented, each covered elsewhere):
  preset            rewrites every other key at once (not one option)
  error_diffusion   minutes-long interpret-mode Mosaic compile per
                    kernel on CPU; sharded parity is pinned bit-exact
                    by tests/test_parallel.py::test_sharded_error_
                    diffusion_gspmd and the config5_ed fidelity preset

Tolerance shape follows the established GSPMD parity tests: configs on
the auto-partitioned fallback run a differently compiled executable
whose few-ulp fusion noise the pipeline's predicate edges amplify on
saturated random pixels — loose isolated-pixel max, tight mean.  A
wholesale divergence moves the mean by orders of magnitude.

Writes OPTION_SWEEP_r{N}.json (per-key rows + summary); exit 1 on any
parity failure or one-sided error.
"""
import argparse
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

EXCLUDE = {
    "preset": "rewrites every key at once",
    "error_diffusion": "interpret-mode Mosaic compile is minutes per "
                       "kernel on CPU; sharded parity pinned bit-exact "
                       "by test_sharded_error_diffusion_gspmd",
}

# parity gate (the established GSPMD-fallback tolerance shape)
MEAN_TOL = 5e-5
FRAC_1E3_TOL = 1e-2


def _flagship_frames(batch, src_h, src_w, seed=0):
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem,
                                                CSP_BT2100_PQ)
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    rng = np.random.default_rng(seed)
    frames = []
    for _ in range(batch):
        y = (rng.random((src_h, src_w)) * 219 + 16).astype(np.uint8)
        u = (rng.random((src_h // 2, src_w // 2)) * 224 + 16).astype(np.uint8)
        v = (rng.random((src_h // 2, src_w // 2)) * 224 + 16).astype(np.uint8)
        frames.append(frame_from_yuv420p(
            y, u, v, color=CSP_BT2100_PQ,
            repr=ColorRepr(sys=ColorSystem.BT_2020_NC,
                           levels=ColorLevels.LIMITED,
                           bits=BitEncoding(8, 8, 0))))
    return frames


def sweep_values(opt, full: bool):
    """Non-default probe values for one option, as strings."""
    default = opt.get() if hasattr(opt, "get") else None
    if opt.type == "bool":
        return ["no" if default else "yes"]
    if opt.type in ("int", "float"):
        lo = opt.minimum if opt.minimum is not None else 0.0
        hi = opt.maximum if opt.maximum is not None else lo + 1.0
        for t in (0.7, 0.3):
            v = lo + (hi - lo) * t
            if opt.type == "int":
                v = int(round(v))
            if v != default:
                return [str(v) if opt.type == "int" else f"{v:.6g}"]
        return []
    if opt.choices:
        ch = [c for c in opt.choices if c != default]
        if full or len(ch) <= 3:
            return list(ch)
        # representatives: both ends + middle of the table order
        return [ch[0], ch[len(ch) // 2], ch[-1]]
    return []


def run_one(kvs, mesh, frames, target):
    """Render single-chip and sharded; return a result row.

    kvs: list of (key, value-string) pairs applied in order.
    """
    from libplacebo_tpu.core.options import Options
    from libplacebo_tpu.parallel import (build_sharded_pipeline,
                                         shard_planes, sharded_state_init)
    from libplacebo_tpu.render.renderer import Renderer

    opts = Options()
    for key, val in kvs:
        opts.set(key, val)
    params = opts.params
    row = {"keys": [k for k, _ in kvs], "values": [v for _, v in kvs],
           "combo": opts.save()}
    if len(kvs) == 1:  # keep the single-key artifact schema stable
        row["key"], row["value"] = kvs[0]
    t0 = time.perf_counter()
    ref = err_ref = None
    try:
        ref = np.asarray(Renderer()._render_once(frames[0], target, params))
    except Exception as e:
        err_ref = f"{type(e).__name__}: {e}"
    out = err_sh = None
    try:
        f0 = frames[0]
        step = build_sharded_pipeline(mesh, f0.meta_key()[0], f0.repr,
                                      f0.color, target, params)
        planes = [np.stack([np.asarray(f.planes[i].data) for f in frames])
                  for i in range(len(f0.planes))]
        xs = shard_planes(mesh, planes)
        state = sharded_state_init(mesh, len(frames))
        res = step(state, *xs)
        out = np.asarray(res[0])
    except Exception as e:
        err_sh = f"{type(e).__name__}: {e}"
    row["seconds"] = round(time.perf_counter() - t0, 2)
    if err_ref or err_sh:
        # both sides refusing identically is parity; one-sided is not
        row["status"] = "both_error" if (err_ref and err_sh) else "one_sided_error"
        row["error_single"] = err_ref
        row["error_sharded"] = err_sh
        row["ok"] = bool(err_ref and err_sh)
        return row
    diff = np.abs(out[0] - ref)
    row.update(diff_mean=float(diff.mean()), diff_max=float(diff.max()),
               frac_gt_1e3=float((diff > 1e-3).mean()),
               finite=bool(np.isfinite(out).all()))
    row["ok"] = (row["diff_mean"] <= MEAN_TOL
                 and row["frac_gt_1e3"] <= FRAC_1E3_TOL and row["finite"])
    row["status"] = "ok" if row["ok"] else "DIVERGED"
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="every enum choice (default: 3 representatives)")
    ap.add_argument("--keys", default=None,
                    help="comma-separated subset of option keys")
    ap.add_argument("--pairs", type=int, default=0,
                    help="instead of the exhaustive single-key sweep, "
                         "sample N random key PAIRS at non-default values")
    ap.add_argument("--seed", type=int, default=0,
                    help="RNG seed for --pairs sampling")
    ap.add_argument("--out", default="OPTION_SWEEP.json")
    args = ap.parse_args()

    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.core.options import OPTION_TABLE, Options
    from libplacebo_tpu.parallel import make_mesh
    from libplacebo_tpu.render.renderer import Target

    mesh = make_mesh(data=1, spatial=4, devices=jax.devices()[:4])
    src_h, src_w = 64, 96
    target = Target(w=2 * src_w, h=2 * src_h, color=CSP_SRGB, bit_depth=0)
    frames = _flagship_frames(1, src_h, src_w, seed=77)

    defaults = Options()
    subset = set(args.keys.split(",")) if args.keys else None
    probes = {}  # key -> list of probe value strings
    for opt in OPTION_TABLE():
        if opt.type == "preset" or opt.key in EXCLUDE:
            continue
        if subset and opt.key not in subset:
            continue
        # default comes from a fresh Options, not the table row
        class _P:  # tiny shim so sweep_values sees the live default
            type = opt.type
            minimum = opt.minimum
            maximum = opt.maximum
            choices = opt.choices
            @staticmethod
            def get():
                return defaults.get(opt.key)
        vals = sweep_values(_P, args.full)
        if vals:
            probes[opt.key] = vals

    if args.pairs:
        rng = np.random.default_rng(args.seed)
        keys = sorted(probes)
        combos = []
        for _ in range(args.pairs):
            ka, kb = (keys[i] for i in rng.choice(len(keys), 2, replace=False))
            combos.append([(ka, probes[ka][rng.integers(len(probes[ka]))]),
                           (kb, probes[kb][rng.integers(len(probes[kb]))])])
    else:
        combos = [[(k, v)] for k in probes for v in probes[k]]

    rows = []
    n_fail = 0
    for kvs in combos:
        row = run_one(kvs, mesh, frames, target)
        rows.append(row)
        if not row["ok"]:
            n_fail += 1
        label = " ".join(f"{k}={v}" for k, v in kvs)
        print(f"[{row['status']:>15s}] {label}"
              f" ({row['seconds']}s"
              + (f", mean {row.get('diff_mean', 0):.2e}" if "diff_mean" in row else "")
              + ")", flush=True)

    summary = {
        "configs": len(rows),
        "failed": n_fail,
        "mode": f"pairs[{args.pairs}] seed={args.seed}" if args.pairs
                else "single-key exhaustive",
        "excluded": EXCLUDE,
        "mesh": {"data": 1, "spatial": 4},
        "size": [src_h, src_w, target.h, target.w],
        "tolerance": {"mean": MEAN_TOL, "frac_gt_1e3": FRAC_1E3_TOL},
    }
    with open(args.out, "w") as f:
        json.dump({"summary": summary, "rows": rows}, f, indent=1)
    print(json.dumps(summary))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
