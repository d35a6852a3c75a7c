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


# -- live settings panel (reference demos/settings.c analog) -----------

def _panel():
    from libplacebo_tpu.core.options import Options
    from settings_ui import SettingsPanel
    return SettingsPanel(Options())


def _type_keys(panel, keys):
    for k in keys:
        assert panel.handle_key(k)


def test_settings_panel_covers_every_option():
    panel = _panel()
    from libplacebo_tpu.core.options import OPTION_TABLE
    real = [o for o in OPTION_TABLE() if o.type != "preset"]
    rows = panel.visible()
    assert len(rows) == len(real)
    # every row formats and reports default-ness without raising
    assert all(isinstance(v, str) for _, v, _ in rows)
    assert all(d for _, _, d in rows)        # fresh Options == defaults


def test_settings_panel_cycle_enum_and_bool():
    panel = _panel()
    _type_keys(panel, list("/upscaler") + ["\n"])   # filter + commit
    rows = panel.visible()
    assert rows and rows[0][0] == "upscaler"
    before = panel.options.get("upscaler")
    _type_keys(panel, [" "])                        # cycle forward
    after = panel.options.get("upscaler")
    assert after != before
    _type_keys(panel, ["LEFT"])                     # cycle back
    assert panel.options.get("upscaler") == before

    panel2 = _panel()
    _type_keys(panel2, list("/deband") + ["\n"])
    assert panel2.visible()[0][0] == "deband"
    assert panel2.options.get("deband") is False
    _type_keys(panel2, [" "])
    assert panel2.options.get("deband") is True
    assert panel2.options.params.deband is not None


def test_settings_panel_edit_validation_and_reset():
    panel = _panel()
    _type_keys(panel, list("/antiringing_strength") + ["\n"])
    assert panel.visible()[0][0] == "antiringing_strength"
    # numeric edit through the key dispatcher
    _type_keys(panel, ["\n"])                       # start edit
    assert panel.editing
    panel.edit_buf = ""
    _type_keys(panel, list("0.7") + ["\n"])         # type + commit
    assert panel.options.get("antiringing_strength") == pytest.approx(0.7)
    # invalid input surfaces in status, never raises (honest degradation)
    _type_keys(panel, ["\n"])
    panel.edit_buf = ""
    _type_keys(panel, list("not_a_number") + ["\n"])
    assert panel.status.startswith("error:")
    assert panel.options.get("antiringing_strength") == pytest.approx(0.7)
    # range clamp comes from Options.set
    panel.start_edit(); panel.edit_buf = "7.0"; panel.commit_edit()
    assert panel.options.get("antiringing_strength") == pytest.approx(1.0)
    # d resets to the default and save() empties again
    assert "antiringing_strength" in panel.options.save()
    _type_keys(panel, ["d"])
    assert panel.options.save() == ""


def test_settings_panel_nudge_float_from_zero():
    """+/- must step a float option off 0.0: `cur or 0` coerced a 0.0
    float to int 0, so type(cur)(0 + step) truncated back to 0 and the
    slider was permanently stuck at zero."""
    panel = _panel()
    _type_keys(panel, list("/antiringing_strength") + ["\n"])
    assert panel.visible()[0][0] == "antiringing_strength"
    assert panel.options.get("antiringing_strength") == 0.0
    _type_keys(panel, ["+"])
    v = panel.options.get("antiringing_strength")
    assert 0.0 < v <= 1.0, v
    _type_keys(panel, ["-"])
    assert panel.options.get("antiringing_strength") == pytest.approx(0.0)
    # int options keep integer stepping
    panel2 = _panel()
    _type_keys(panel2, list("/dither_lut_size") + ["\n"])
    assert panel2.visible()[0][0] == "dither_lut_size"
    before = panel2.options.get("dither_lut_size")
    _type_keys(panel2, ["+"])
    after = panel2.options.get("dither_lut_size")
    assert isinstance(after, int) and after == before + 1


def test_settings_panel_preset_and_save_string():
    panel = _panel()
    _type_keys(panel, ["p"])                        # default -> fast
    assert panel.preset == "fast"
    saved = panel.options.save()
    # the fast preset flips real params (same contract as --preset fast)
    from libplacebo_tpu.core.options import Options
    ref = Options(); ref.parse("preset=fast")
    assert saved == ref.save()
    _type_keys(panel, ["s"])
    assert panel.status != ""
    # quit key closes the panel
    assert panel.handle_key("q") is False
