"""Deinterlacing tests — oracle properties of each algorithm."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.ops.deinterlace import (DeinterlaceAlgo,
                                            DeinterlaceParams, Field,
                                            deinterlace)


def _interlaced_frame(h=32, w=48):
    """Progressive source -> two fields woven together: even lines from
    frame A, odd lines from frame B (B = A shifted)."""
    rng = np.random.default_rng(0)
    a = rng.random((1, h, w)).astype(np.float32)
    b = np.roll(a, 2, axis=-1)
    woven = np.where((np.arange(h) % 2 == 0)[None, :, None], a, b)
    return jnp.asarray(woven), a, b


def test_weave_identity():
    img, _, _ = _interlaced_frame()
    out = deinterlace(img, Field.TOP,
                      DeinterlaceParams(DeinterlaceAlgo.WEAVE))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_bob_copies_field_lines():
    img, a, b = _interlaced_frame()
    out = np.asarray(deinterlace(img, Field.TOP,
                                 DeinterlaceParams(DeinterlaceAlgo.BOB)))
    # even (top-field) lines unchanged
    np.testing.assert_array_equal(out[:, ::2], np.asarray(img)[:, ::2])
    # odd lines replaced by the line above (dy=-1)
    np.testing.assert_array_equal(out[:, 1::2], np.asarray(img)[:, 0:-1:2])


@pytest.mark.parametrize("algo", [DeinterlaceAlgo.YADIF,
                                  DeinterlaceAlgo.BWDIF])
def test_adaptive_reconstruction(algo):
    """On a static scene (prev == cur == next), yadif/bwdif should
    reconstruct the opposite field almost perfectly from temporal
    information."""
    rng = np.random.default_rng(1)
    # smooth content (deinterlacers assume band-limited fields)
    base = rng.random((1, 8, 12)).astype(np.float32)
    from libplacebo_tpu.ops.sampling import sample_bilinear
    frame = np.asarray(sample_bilinear(jnp.asarray(base), 32, 48))
    f = jnp.asarray(frame)
    out = np.asarray(deinterlace(
        f, Field.TOP, DeinterlaceParams(algo), prev=f, next=f))
    # top-field lines pass through
    np.testing.assert_array_equal(out[:, ::2], frame[:, ::2])
    # reconstructed lines close to the true progressive content
    err = np.abs(out[:, 1::2] - frame[:, 1::2]).max()
    assert err < 0.05, err


def test_yadif_intra_fallback():
    """Without neighbor frames, yadif still produces something sane."""
    img, _, _ = _interlaced_frame()
    out = np.asarray(deinterlace(img, Field.BOTTOM,
                                 DeinterlaceParams(DeinterlaceAlgo.YADIF)))
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out[:, 1::2], np.asarray(img)[:, 1::2])


def test_bwdif_intra_only():
    img, _, _ = _interlaced_frame()
    out = np.asarray(deinterlace(img, Field.TOP,
                                 DeinterlaceParams(DeinterlaceAlgo.BWDIF)))
    assert np.all(np.isfinite(out))


def test_field_parity():
    img, _, _ = _interlaced_frame()
    top = np.asarray(deinterlace(img, Field.TOP,
                                 DeinterlaceParams(DeinterlaceAlgo.BOB)))
    bot = np.asarray(deinterlace(img, Field.BOTTOM,
                                 DeinterlaceParams(DeinterlaceAlgo.BOB)))
    # each keeps its own field's lines
    np.testing.assert_array_equal(top[:, ::2], np.asarray(img)[:, ::2])
    np.testing.assert_array_equal(bot[:, 1::2], np.asarray(img)[:, 1::2])
    assert not np.array_equal(top, bot)
