#!/usr/bin/env python3
"""In-process A/B of the plane-upload paths (r4 device-side
normalization vs the host-side numpy path, LPTPU_DEVICE_NORM=0).

The axon tunnel's transfer throughput varies ~10x BETWEEN processes,
so the two paths are interleaved in ONE process (the same discipline
CLAUDE.md prescribes for sub-ms kernel A/Bs).  Raw-integer upload
ships 2-4x fewer link bytes and runs the UNORM normalize / bit-shift /
(H,W,C)->(C,H,W) relayout on device; values are bit-identical (pinned
by tests/test_utils.py).

Usage: python tools/bench_upload_ab.py [--json FILE]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None, metavar="FILE")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax  # noqa: F401  (device init)
    import libplacebo_tpu.utils.upload as up

    H, W = 1080, 1920
    rng = np.random.default_rng(0)
    cases = (
        ("u8 (H,W,3)", rng.integers(0, 256, (H, W, 3)).astype(np.uint8),
         {}),
        ("p010 (H,W,3) u16 msb", (rng.integers(0, 1024, (H, W, 3))
                                  .astype(np.uint16) << 6),
         dict(bit_depth=10, bit_shift=6)),
    )

    def run(arr, kw, dev_norm):
        up._DEVICE_NORM = dev_norm
        p = up.upload_plane(up.PlaneData(arr, (0, 1, 2), **kw))
        return float(p.data.ravel()[0])    # force (the tunnel is lazy)

    results = []
    for name, arr, kw in cases:
        run(arr, kw, True)
        run(arr, kw, False)                # warm both (compiles)
        med = {}
        for dev_norm in (True, False):
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                run(arr, kw, dev_norm)
                ts.append((time.perf_counter() - t0) * 1e3)
            med[dev_norm] = sorted(ts)[len(ts) // 2]
            label = "device-norm" if dev_norm else "host-norm"
            print(f"{name:22s} {label:12s} median "
                  f"{med[dev_norm]:7.1f} ms", flush=True)
        results.append({"case": name, "bytes_raw": int(arr.nbytes),
                        "device_norm_ms": round(med[True], 1),
                        "host_norm_ms": round(med[False], 1),
                        "speedup": round(med[False] / med[True], 2)})
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"tool": "tools/bench_upload_ab.py",
                       "note": "interleaved one-process A/B; axon "
                               "tunnel varies ~10x between processes",
                       "runs": results}, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
