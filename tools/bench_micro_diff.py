#!/usr/bin/env python3
"""Compare two per-pass microbench artifacts (BENCH_MICRO_r*.json).

The reference registers its ~40-pass benchmark as a test
(src/meson.build:326-331) so pass-level regressions surface in CI; the
analog here is this differ plus `tests/test_subsystems.py`'s artifact
check: any pass slower than REGRESS_X times the previous round (beyond
a small absolute floor, to keep tunnel noise out) is flagged.

Usage:
    python tools/bench_micro_diff.py                 # two newest in repo
    python tools/bench_micro_diff.py OLD.json NEW.json
Exit code 1 if any pass regressed.
"""
import glob
import json
import os
import re
import sys

REGRESS_X = 1.5          # flag passes slower than 1.5x previous round
NOISE_MS = 0.30          # ... but only beyond this absolute delta
# host<->device transfer paths ride the axon tunnel whose throughput
# varies by an order of magnitude run-to-run; compare compute passes
SKIP = re.compile(r"^tex_(upload|download)")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_two():
    files = sorted(glob.glob(os.path.join(REPO, "BENCH_MICRO_r*.json")))
    if len(files) < 2:
        return None
    return files[-2], files[-1]


def diff(old_path: str, new_path: str):
    with open(old_path) as f:
        old = json.load(f)
    with open(new_path) as f:
        new = json.load(f)
    if old.get("size") != new.get("size"):
        print(f"size mismatch {old.get('size')} vs {new.get('size')} — "
              "not comparable")
        return []
    regressions = []
    for name, ms_new in new.get("passes", {}).items():
        ms_old = old.get("passes", {}).get(name)
        if ms_old is None or ms_new is None or SKIP.match(name):
            continue
        mark = ""
        if ms_new > ms_old * REGRESS_X and ms_new - ms_old > NOISE_MS:
            mark = "  <-- REGRESSED"
            regressions.append((name, ms_old, ms_new))
        elif ms_old > ms_new * REGRESS_X and ms_old - ms_new > NOISE_MS:
            mark = "  (improved)"
        print(f"{name:28s} {ms_old:9.3f} -> {ms_new:9.3f} ms{mark}")
    gone = [n for n, v in old.get("passes", {}).items()
            if v is not None and new.get("passes", {}).get(n) is None]
    for n in gone:
        print(f"{n:28s} no longer measured (was "
              f"{old['passes'][n]:.3f} ms)")
    return regressions


def main() -> int:
    if len(sys.argv) == 3:
        pair = (sys.argv[1], sys.argv[2])
    else:
        pair = newest_two()
        if pair is None:
            print("fewer than two BENCH_MICRO_r*.json artifacts — "
                  "nothing to diff")
            return 0
    print(f"# {pair[0]} -> {pair[1]}")
    regs = diff(*pair)
    if regs:
        print(f"\n{len(regs)} pass(es) regressed >{REGRESS_X}x")
        return 1
    print("\nno pass-level regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())
