"""Smoke tests for the demo entry points (reference demos/: colors.c,
sdlimage.c). Run in-process with tiny sizes; conftest already forces
the CPU backend."""
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "demos"))


def _run_main(mod, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", [mod.__name__] + argv)
    mod.main()


def test_colors_demo(tmp_path, monkeypatch, capsys):
    import colors
    out = tmp_path / "colors.y4m"
    _run_main(colors, ["--frames", "4", "--size", "96x64",
                       "--write-y4m", str(out)], monkeypatch)
    data = out.read_bytes()
    assert data.startswith(b"YUV4MPEG2")
    assert data.count(b"FRAME") == 4
    assert "4 frames" in capsys.readouterr().out


def test_image_viewer_demo(tmp_path, monkeypatch, capsys):
    from libplacebo_tpu.utils.y4m import read_png, write_png
    import image_viewer

    rng = np.random.default_rng(0)
    img = np.clip(np.linspace(0, 239, 64 * 96 * 3).reshape(64, 96, 3)
                  + rng.uniform(0, 16, (64, 96, 3)), 0, 255).astype(np.uint8)
    src = tmp_path / "in.png"
    write_png(str(src), img)
    osd = np.zeros((12, 24, 4), np.uint8)
    osd[..., 0] = 255
    osd[..., 3] = 200
    osd_p = tmp_path / "osd.png"
    write_png(str(osd_p), osd)
    lut = tmp_path / "warm.cube"
    lut.write_text("LUT_3D_SIZE 2\n0 0 0\n1 0 0\n0 1 0\n1 1 0\n"
                   "0 0 1\n1 0 1\n0 1 1\n1 1 1\n")
    out = tmp_path / "out.png"

    _run_main(image_viewer, [str(src), "--osd", str(osd_p),
                             "--lut", str(lut), "--out", "192x128",
                             "--output", str(out)], monkeypatch)
    assert "rendered" in capsys.readouterr().out
    res = read_png(str(out))
    assert res.shape[-2:] == (128, 192)
    # the OSD tint must be visible near the top-left corner
    assert res[0, 22, 28] > res[1, 22, 28] + 0.2
    # letterboxing: image aspect 96/64=1.5 into 192/128=1.5 -> full fill,
    # so the far corner carries image content, not padding
    assert res[:3, -2, -2].mean() > 0.1


def test_bench_micro_smoke(monkeypatch, capsys, tmp_path):
    """tools/bench_micro.py (the bench.c pass-list analog) must run
    every pass without SKIPs on the CPU backend."""
    import json
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        import bench_micro
    finally:
        sys.path.pop(0)
    out = tmp_path / "bm.json"
    monkeypatch.setattr(sys, "argv", ["bench_micro", "--size", "128x96",
                                      "--n", "1", "--json", str(out)])
    bench_micro.main()
    text = capsys.readouterr().out
    assert "SKIP" not in text
    data = json.loads(out.read_text())
    # the full reference pass list is present and timed
    for name in ("bilinear", "bicubic", "hermite", "gaussian", "deband",
                 "deband_heavy", "weave", "bob", "yadif", "bwdif",
                 "polar (ewa_lanczos)", "dither_blue", "dither_white",
                 "dither_ordered_fixed", "hdr_peakdetect",
                 "hdr_peakdetect_hq", "hdr_lut (spline tone)", "hdr_clip",
                 "av1_grain (luma)", "h274_grain", "reshape_poly",
                 "reshape_mmr", "tex_upload ptr", "tex_download ptr"):
        assert data["passes"].get(name) is not None, name
