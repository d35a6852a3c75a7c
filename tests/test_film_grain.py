"""AV1 film grain synthesis tests — oracle: AV1 spec §7.18.3 structure,
reference src/shaders/film_grain_av1.c."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.core import film_grain as fg
from libplacebo_tpu.core.film_grain import AV1GrainData, FilmGrainData
from libplacebo_tpu.ops import film_grain as ops_fg


# a representative grain config (values typical of av1 streams)
GRAIN = AV1GrainData(
    num_points_y=6,
    points_y=((0, 4), (20, 5), (39, 5), (59, 5), (78, 5), (255, 40)),
    chroma_scaling_from_luma=False,
    num_points_uv=(2, 2),
    points_uv=(((0, 8), (255, 18)), ((0, 6), (255, 14))),
    scaling_shift=11,
    ar_coeff_lag=3,
    ar_coeffs_y=tuple(np.random.default_rng(5).integers(-30, 30, 24)),
    ar_coeffs_uv=(tuple(np.random.default_rng(6).integers(-20, 20, 25)),
                  tuple(np.random.default_rng(7).integers(-20, 20, 25))),
    ar_coeff_shift=7,
    grain_scale_shift=0,
    uv_mult=(64, 64), uv_mult_luma=(32, 32), uv_offset=(0, 0),
    overlap=True,
)
DATA = FilmGrainData(type="av1", seed=7391, av1=GRAIN)


def test_lcg_matches_spec():
    # LFSR taps 0,1,3,12 — verify a known progression property: 16-bit
    # state, period-complete behavior on a few steps
    v, s = fg._lcg(0x1234, 8)
    assert 0 <= v < 256
    v2, s2 = fg._lcg(s, 8)
    assert s2 != s


def test_grain_lut_shape_and_stats():
    lut, buf = fg.generate_grain_y(GRAIN, DATA.seed)
    assert lut.shape == (64, 64)
    # zero-mean-ish noise, nonzero variance
    assert abs(float(lut.mean())) < 0.02
    assert float(lut.std()) > 1e-4


def test_grain_deterministic():
    a, _ = fg.generate_grain_y(GRAIN, 100)
    b, _ = fg.generate_grain_y(GRAIN, 100)
    c, _ = fg.generate_grain_y(GRAIN, 101)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_chroma_grain():
    lut = fg.generate_grain_uv(GRAIN, DATA.seed, 1, 1, 1)
    assert lut.shape == (32, 32)
    lut2 = fg.generate_grain_uv(GRAIN, DATA.seed, 2, 1, 1)
    assert not np.array_equal(lut, lut2)   # different channel seeds


def test_offsets_packing():
    off = fg.generate_offsets(1234, 8, 4)
    assert off.shape == (4, 8) and off.dtype == np.uint32
    # left-offset of block x equals the neighbor's own offset
    own = off & 0xFF
    left = (off >> 8) & 0xFF
    np.testing.assert_array_equal(left[:, 1:], own[:, :-1])
    top = (off >> 16) & 0xFF
    np.testing.assert_array_equal(top[1:], own[:-1])


def test_scaling_lut():
    lut = fg.generate_scaling(GRAIN.points_y, GRAIN.scaling_shift)
    assert lut.shape == (256,)
    rng = 1 << GRAIN.scaling_shift
    assert lut[0] == pytest.approx(4 / rng)
    assert lut[255] == pytest.approx(40 / rng)
    # monotone between last two points (5 -> 40)
    assert np.all(np.diff(lut[78:]) >= 0)


def test_needs_fg():
    assert ops_fg.needs_fg(DATA)
    assert not ops_fg.needs_fg(None)
    assert not ops_fg.needs_fg(FilmGrainData(type="av1", av1=AV1GrainData()))


def test_apply_grain_luma_plane():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((1, 96, 128)).astype(np.float32) * 0.5 + 0.2)
    cfg = ops_fg.grain_cfg_for(DATA, (0,))
    tables = ops_fg.prepare_av1_grain(DATA, cfg, 96, 128)
    out = ops_fg.apply_av1_grain(img, tables, cfg, GRAIN.scaling_shift)
    o, i = np.asarray(out), np.asarray(img)
    assert o.shape == i.shape
    assert not np.array_equal(o, i)          # grain was added
    diff = o - i
    assert abs(diff.mean()) < 0.005          # ~zero-mean noise
    assert diff.std() > 1e-4
    # limited-range clamps respected
    assert o.min() >= 16 / 256.0 * (256 / 255.0) - 1e-6


def test_apply_grain_matches_numpy_oracle():
    """Device tile assembly equals direct numpy indexing of the LUT
    (no overlap, to isolate the assembly path)."""
    data = FilmGrainData(type="av1", seed=99, av1=AV1GrainData(
        num_points_y=2, points_y=((0, 20), (255, 20)),
        ar_coeff_lag=0, scaling_shift=8, overlap=False))
    h, w = 64, 96
    cfg = ops_fg.grain_cfg_for(data, (0,), limited_range=False)
    tables = ops_fg.prepare_av1_grain(data, cfg, h, w)
    img = jnp.zeros((1, h, w), jnp.float32) + 0.5
    out = np.asarray(ops_fg.apply_av1_grain(img, tables, cfg, 8))[0]

    lut, _ = fg.generate_grain_y(data.av1, data.seed)
    offsets = fg.generate_offsets(data.seed, (w + 31) // 32, (h + 31) // 32)
    expect = np.zeros((h, w), np.float32)
    for y in range(h):
        for x in range(w):
            o = int(offsets[y // 32][x // 32] & 0xFF)
            oy, ox = 2 * (o & 0xF), 2 * (o >> 4)
            g = lut[oy + y % 32, ox + x % 32]
            expect[y, x] = 0.5 + (20 / 256.0) * g
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_grain_seed_changes_without_recompile():
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    from libplacebo_tpu.render.renderer import Renderer, Target
    import dataclasses
    rng = np.random.default_rng(1)
    y = (rng.random((64, 96)) * 219 + 16).astype(np.uint8)
    u = (rng.random((32, 48)) * 224 + 16).astype(np.uint8)
    v = (rng.random((32, 48)) * 224 + 16).astype(np.uint8)
    f1 = frame_from_yuv420p(y, u, v)
    f1.film_grain = DATA
    r = Renderer()
    out1 = r.render(f1, Target(w=96, h=64))
    n = len(r._cache)
    f2 = frame_from_yuv420p(y, u, v)
    f2.film_grain = dataclasses.replace(DATA, seed=1111)
    out2 = r.render(f2, Target(w=96, h=64))
    assert len(r._cache) == n            # same compiled pipeline
    assert not np.array_equal(np.asarray(out1), np.asarray(out2))


def test_native_matches_python():
    """Native C++ grain tables are bit-exact with the Python reference
    implementation (1 ulp tolerance on the float scaling)."""
    import libplacebo_tpu.native as nat
    if not nat.available():
        import pytest
        pytest.skip("no native toolchain")
    lut_n, buf_n = fg.generate_grain_y.__wrapped__(GRAIN, 555)
    uv_n = fg.generate_grain_uv.__wrapped__(GRAIN, 555, 1, 1, 1)
    off_n = fg.generate_offsets.__wrapped__(555, 16, 8)
    saved = (nat.grain_y_native, nat.grain_uv_native,
             nat.grain_offsets_native)
    try:
        nat.grain_y_native = lambda *a, **k: None
        nat.grain_uv_native = lambda *a, **k: None
        nat.grain_offsets_native = lambda *a, **k: None
        lut_p, buf_p = fg.generate_grain_y.__wrapped__(GRAIN, 555)
        uv_p = fg.generate_grain_uv.__wrapped__(GRAIN, 555, 1, 1, 1)
        off_p = fg.generate_offsets.__wrapped__(555, 16, 8)
    finally:
        (nat.grain_y_native, nat.grain_uv_native,
         nat.grain_offsets_native) = saved
    np.testing.assert_array_equal(buf_n, buf_p)
    np.testing.assert_allclose(lut_n, lut_p, atol=1e-7)
    np.testing.assert_allclose(uv_n, uv_p, atol=1e-7)
    np.testing.assert_array_equal(off_n, off_p)


def test_needs_film_grain_dispatch():
    """Reference pl_needs_film_grain (film_grain.c:21): per-channel and
    per-type presence checks."""
    from libplacebo_tpu.core.film_grain import H274GrainData
    assert not ops_fg.needs_film_grain(None)
    # AV1: luma-only grain applies to a Y plane but not a Cb/Cr plane
    luma_only = FilmGrainData(type="av1", av1=AV1GrainData(
        num_points_y=2, points_y=((0, 40), (255, 40))))
    assert ops_fg.needs_film_grain(luma_only, (0,))
    assert not ops_fg.needs_film_grain(luma_only, (1, 2))
    # chroma_scaling_from_luma activates the chroma channels
    csl = FilmGrainData(type="av1", av1=AV1GrainData(
        num_points_y=2, points_y=((0, 40), (255, 40)),
        chroma_scaling_from_luma=True))
    assert ops_fg.needs_film_grain(csl, (1, 2))
    # H.274: only model_id==0 is applicable (film_grain_h274.c:131)
    h = FilmGrainData(type="h274", h274=H274GrainData(
        component_model_present=(True, False, False)))
    assert ops_fg.needs_film_grain(h, (0,))
    assert not ops_fg.needs_film_grain(h, (1, 2))
    from dataclasses import replace
    assert not ops_fg.needs_film_grain(
        replace(h, h274=H274GrainData(model_id=1,
                component_model_present=(True, True, True))))
