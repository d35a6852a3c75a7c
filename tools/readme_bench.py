#!/usr/bin/env python3
"""Mechanically stamp README.md's headline numbers from bench artifacts.

The README's headline fps went stale for three rounds running (VERDICT
r2-r4) because a human sentence had to track a machine-made number.
This kills the class structurally:

- README.md carries invisible markers around the two headline spans:
      <!--bench:headline-->...<!--/bench:headline-->
      <!--bench:config5-->...<!--/bench:config5-->
- `update_from_artifacts()` regenerates both spans from the NEWEST
  BENCH_r*.json / BENCH_CONFIG5_r*.json in the repo.
- bench.py / tools/bench_config5.py stamp their freshly measured value
  directly after a successful run (so the driver's end-of-round bench
  refreshes the README in the same breath that produces the artifact).
- tests/test_subsystems.py calls `check()`: any README number that
  drifts >10% from the newest artifact (far beyond tunnel noise,
  exactly the one-whole-round staleness class) fails the suite.

Usage:
    python tools/readme_bench.py            # check, exit 1 on drift
    python tools/readme_bench.py --update   # stamp from newest artifacts
"""
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
README = os.path.join(REPO, "README.md")

_SPAN = "<!--bench:{tag}-->{body}<!--/bench:{tag}-->"


def newest(pattern):
    """Newest artifact by round number, or None."""
    files = sorted(glob.glob(os.path.join(REPO, pattern)))
    return files[-1] if files else None


def _read_value(path, metric_substr=None):
    """First record whose metric contains `metric_substr` (JSON object
    or one-JSON-line-per-variant file)."""
    with open(path) as f:
        text = f.read().strip()
    records = []
    try:
        obj = json.loads(text)
        if isinstance(obj, list):
            records = obj
        elif "runs" in obj:                 # BENCH_CONFIG5_r* shape
            records = obj["runs"]
        elif "parsed" in obj:               # driver BENCH_r* shape
            records = [obj["parsed"]]
        else:
            records = [obj]
    except json.JSONDecodeError:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                records.append(json.loads(line))
    for rec in records:
        if metric_substr is None or metric_substr in rec.get("metric", ""):
            return rec
    return records[0] if records else None


def _stamp_span(text, tag, body):
    pat = re.compile(r"<!--bench:%s-->.*?<!--/bench:%s-->" % (tag, tag),
                     re.S)
    span = _SPAN.format(tag=tag, body=body)
    if not pat.search(text):
        raise SystemExit(f"README.md is missing the bench:{tag} markers")
    return pat.sub(span, text)


def _span_body(text, tag):
    m = re.search(r"<!--bench:%s-->(.*?)<!--/bench:%s-->" % (tag, tag),
                  text, re.S)
    return m.group(1) if m else None


def _fps_in(body):
    m = re.search(r"([\d.]+)\s*fps", body or "")
    return float(m.group(1)) if m else None


def headline_body(fps, vs, artifact=None):
    src = f"`{os.path.basename(artifact)}`" if artifact else \
        "`python bench.py`"
    return (f"**{fps:.0f} fps sustained on one TPU v5e chip** "
            f"(target: 60; {vs:.2f}× the reference baseline, {src})")


def config5_body(fps, artifact=None):
    src = f" (`{os.path.basename(artifact)}`)" if artifact else ""
    return f"**{fps:.0f} fps**{src}"


def stamp_headline(fps, vs, artifact=None):
    with open(README) as f:
        text = f.read()
    text = _stamp_span(text, "headline", headline_body(fps, vs, artifact))
    with open(README, "w") as f:
        f.write(text)


def stamp_config5(fps, artifact=None):
    with open(README) as f:
        text = f.read()
    text = _stamp_span(text, "config5", config5_body(fps, artifact))
    with open(README, "w") as f:
        f.write(text)


def update_from_artifacts():
    bench = newest("BENCH_r*.json")
    cfg5 = newest("BENCH_CONFIG5_r*.json")
    if bench:
        rec = _read_value(bench)
        stamp_headline(rec["value"], rec["vs_baseline"], bench)
    if cfg5:
        rec = _read_value(cfg5, "error_diffusion")
        stamp_config5(rec["value"], cfg5)
    return bench, cfg5


def check():
    """Return a list of human-readable drift complaints (empty = fresh)."""
    with open(README) as f:
        text = f.read()
    problems = []
    for tag, pattern, metric in (
            ("headline", "BENCH_r*.json", None),
            ("config5", "BENCH_CONFIG5_r*.json", "error_diffusion")):
        body = _span_body(text, tag)
        if body is None:
            problems.append(f"README.md lost its bench:{tag} markers")
            continue
        art = newest(pattern)
        if art is None:
            continue
        rec = _read_value(art, metric)
        if not rec or not rec.get("value"):
            continue
        have = _fps_in(body)
        wantv = float(rec["value"])
        if have is None:
            problems.append(f"bench:{tag} span has no fps number")
        elif abs(have - wantv) > 0.10 * wantv:
            problems.append(
                f"bench:{tag} cites {have} fps but the newest artifact "
                f"{os.path.basename(art)} says {wantv} — run "
                "`python tools/readme_bench.py --update`")
        # a *named* artifact must be the newest one
        m = re.search(r"`(BENCH_[A-Z0-9_]*r\d+\.json)`", body)
        if m and m.group(1) != os.path.basename(art):
            problems.append(
                f"bench:{tag} cites {m.group(1)} but the newest artifact "
                f"is {os.path.basename(art)}")
    return problems


def main():
    if "--update" in sys.argv:
        bench, cfg5 = update_from_artifacts()
        print(f"stamped from {os.path.basename(bench or '?')} and "
              f"{os.path.basename(cfg5 or '?')}")
        return 0
    problems = check()
    for p in problems:
        print(p)
    if not problems:
        print("README headline numbers are fresh")
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
