"""Headline benchmark: 1080p->4K EWA-Jinc upscale + HDR PQ->SDR tone map,
sustained fps on one TPU chip (BASELINE.md north star: >= 60 fps,
>= 45 dB PSNR vs reference).

Measures steady-state device throughput with a serialized on-device chain
(each frame depends on the previous output), so neither host dispatch
overhead nor the axon tunnel's ~30 ms fetch RTT pollutes the number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as graft

    fn, args = graft.entry()

    def chained(state, grain, temporal, ovl, dv, hs, y, u, v, n):
        def body(i, carry):
            state, out = carry
            # microscopic dependency on the previous frame's output
            # serializes the chain without changing the math; peak state
            # carries across frames like real playback
            out, state, _ = fn(state, grain, temporal, ovl, dv, hs,
                               y + out[0, 0, 0] * 1e-12, u, v)
            return (state, out)
        out0, state, _ = fn(state, grain, temporal, ovl, dv, hs, y, u, v)
        _, out = jax.lax.fori_loop(0, n, body, (state, out0))
        return out

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    jc = jax.jit(chained, static_argnames="n")
    out = jc(*args, n=n)
    _ = float(out.ravel()[0])          # force compile + first run

    t0 = time.perf_counter()
    out = jc(*args, n=n)
    _ = float(out.ravel()[0])          # force completion
    dt = time.perf_counter() - t0
    fps = (n + 1) / dt

    print(json.dumps({
        "metric": "1080p->4K EWA-Jinc + PQ->SDR tone-map, frames/sec/chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 3),
    }))

    # re-stamp the README headline from this very measurement so the
    # published number can never go a round stale again (the tools/
    # readme_bench.py check in the test suite enforces freshness)
    try:
        import os
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "tools"))
        import readme_bench
        readme_bench.stamp_headline(fps, fps / 60.0)
    except Exception as e:                          # noqa: BLE001
        print(f"README stamp skipped: {e}", file=sys.stderr)


def _backend_alive(timeout_s: float = 90.0) -> bool:
    """Probe the TPU backend in a subprocess (a dead axon tunnel makes
    jax.devices() HANG, not raise — it must not take this process
    down with it)."""
    import subprocess
    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    # the axon tunnel occasionally drops; retry a few times before
    # giving up so a transient outage doesn't void the measurement
    attempts = 4
    for i in range(attempts):
        if _backend_alive():
            break
        if i == attempts - 1:
            print(json.dumps({"metric": "bench-skipped",
                              "value": 0, "unit": "fps",
                              "vs_baseline": 0,
                              "error": "TPU backend unavailable "
                                       f"after {attempts} probes"}))
            sys.exit(1)
        time.sleep(60)
    main()
