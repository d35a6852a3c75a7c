"""Multi-chip sharding tests on the 8-device virtual CPU mesh — the
analog of distributed tests the reference doesn't have (SURVEY.md §5.8:
its only multi-device path is multigpu-bench frame hand-off)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from libplacebo_tpu.parallel import (make_mesh, shard_frame_batch,
                                     sharded_render_step)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


def test_mesh_shapes(devices):
    mesh = make_mesh(data=2, spatial=4)
    assert mesh.shape == {"data": 2, "spatial": 4}


@pytest.mark.parametrize("data,spatial", [(1, 8), (2, 4), (4, 2)])
def test_sharded_matches_single_device(devices, data, spatial):
    mesh = make_mesh(data=data, spatial=spatial)
    src_h, src_w, dst_h, dst_w = 64, 96, 128, 192
    step = sharded_render_step(mesh, src_h, src_w, dst_h, dst_w,
                               bit_depth=0)
    rng = np.random.default_rng(0)
    batch = rng.random((data * 2, 3, src_h, src_w)).astype(np.float32)
    out = np.asarray(step(shard_frame_batch(mesh, jnp.asarray(batch))))

    mesh1 = make_mesh(data=1, spatial=1, devices=devices[:1])
    step1 = sharded_render_step(mesh1, src_h, src_w, dst_h, dst_w,
                                bit_depth=0)
    ref = np.asarray(step1(jnp.asarray(batch)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sharded_output_sharding(devices):
    mesh = make_mesh(data=2, spatial=4)
    step = sharded_render_step(mesh, 32, 64, 64, 128)
    batch = jnp.ones((2, 3, 32, 64), jnp.float32) * 0.3
    x = shard_frame_batch(mesh, batch)
    out = step(x)
    # output keeps the (data, spatial) sharding — no gather to host
    assert not out.sharding.is_fully_replicated
    assert out.shape == (2, 3, 64, 128)


def test_tone_map_device_matches_host():
    """tm.apply_device == LUT sampling of tm.generate at high resolution."""
    from libplacebo_tpu.core import tone_mapping as tm
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    p = tm.ToneMapParams(
        function=tm.TONE_MAP_BT2390,
        input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
        lut_size=4096,
        input_min=0.0,
        input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0),
        output_min=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 0.005),
        output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0))
    lut = tm.generate(p)
    xs = np.linspace(p.input_min, p.input_max, p.lut_size).astype(np.float32)
    dev = np.asarray(tm.apply_device(jnp.asarray(xs), p))
    np.testing.assert_allclose(dev, lut, atol=2e-4)


def test_tone_map_device_all_functions():
    from libplacebo_tpu.core import tone_mapping as tm
    from libplacebo_tpu.core.colorspace import HdrScaling, hdr_rescale
    xs = jnp.asarray(np.linspace(0.0, 0.75, 64).astype(np.float32))
    for fun in tm.TONE_MAP_FUNCTIONS:
        p = tm.ToneMapParams(
            function=fun,
            input_scaling=HdrScaling.PQ, output_scaling=HdrScaling.PQ,
            input_min=0.0,
            input_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 1000.0),
            output_min=0.0,
            output_max=hdr_rescale(HdrScaling.NITS, HdrScaling.PQ, 203.0))
        out = np.asarray(tm.apply_device(xs, p))
        assert np.all(np.isfinite(out)), fun.name
