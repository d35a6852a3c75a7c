"""mpv .hook user-shader ingestion — oracle: the reference's own
user_shader_tests (src/tests/gpu_tests.c:999-1080) and
pl_mpv_user_shader_parse semantics (src/shaders/custom_mpv.c:1594)."""
import numpy as np
import jax.numpy as jnp
import pytest

from libplacebo_tpu.render.hooks import HookStage, run_hooks
from libplacebo_tpu.render.mpv_hooks import (MpvHookError, UserShader,
                                             parse_user_shader,
                                             user_shader_hook)


# the reference's own first test shader (gpu_tests.c:1001-1024):
# upscale 10x at NATIVE gated on size, save, then load at MAIN
SAVE_LOAD_SHADER = """\
// Example of a comment at the beginning

//!HOOK NATIVE
//!DESC upscale image
//!BIND HOOKED
//!WIDTH HOOKED.w 10 *
//!HEIGHT HOOKED.h 10 *
//!SAVE NATIVEBIG
//!WHEN NATIVE.w 500 <

vec4 hook()
{
    return HOOKED_texOff(0);
}

//!HOOK MAIN
//!DESC downscale bigger image
//!WHEN NATIVE.w 500 <
//!BIND NATIVEBIG

vec4 hook()
{
    return NATIVEBIG_texOff(0);
}
"""

DISCO_SHADER = """\
//!HOOK MAIN
//!DESC turn everything into colorful pixels
//!BIND HOOKED
//!BIND DISCO
//!COMPONENTS 3

vec4 hook()
{
    return vec4(DISCO_tex(HOOKED_pos * 10.0).rgb, 1);
}

//!TEXTURE DISCO
//!SIZE 3 3
//!FORMAT rgba8
//!FILTER NEAREST
//!BORDER REPEAT
ff0000ff00ff00ff0000ffff00ffffffff00ffffffff00ff4c4c4cff999999ffffffffff
"""

PARAM_SHADER = """\
//!PARAM intensity
//!DESC sharpening intensity
//!TYPE DYNAMIC float
//!MINIMUM 0.0
//!MAXIMUM 100.0
1.0

//!PARAM testconst
//!TYPE CONSTANT uint
//!MAXIMUM 16
3

//!HOOK MAIN
//!WHEN testconst 30 >
//!BIND HOOKED
vec4 hook() { return vec4(0.0); }

//!HOOK MAIN
//!WHEN testconst 2 >
//!BIND HOOKED
vec4 hook() { return intensity * HOOKED_texOff(0); }
"""

# a realistic community-style unsharp-mask hook (the structure of mpv's
# classic sharpen hooks: 4-tap cross texOff + PARAM strength)
UNSHARP_SHADER = """\
//!HOOK LUMA
//!HOOK MAIN
//!BIND HOOKED
//!DESC unsharp masking
//!PARAM removed-by-next-block
vec4 hook() { return vec4(0.0); }
"""

UNSHARP_REAL = """\
//!PARAM strength
//!TYPE DYNAMIC float
//!MINIMUM 0.0
//!MAXIMUM 3.0
0.5

//!HOOK MAIN
//!BIND HOOKED
//!DESC unsharp masking

#define get(off) HOOKED_texOff(off)

vec4 hook()
{
    vec4 color = get(vec2(0.0, 0.0));
    vec4 blur = (get(vec2(1.0, 0.0)) + get(vec2(-1.0, 0.0)) +
                 get(vec2(0.0, 1.0)) + get(vec2(0.0, -1.0))) / 4.0;
    return color + (color - blur) * strength;
}
"""


def _img(h=8, w=12, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.random((3, h, w)).astype(np.float32))


def test_parse_save_load_shader():
    sh = parse_user_shader(SAVE_LOAD_SHADER)
    assert len(sh.passes) == 2
    p0, p1 = sh.passes
    assert p0.hook_texs == ["NATIVE"]
    assert p0.save_tex == "NATIVEBIG"
    assert p0.width is not None and p0.cond is not None
    assert p1.bind_texs == ["NATIVEBIG"]


def test_save_load_runs_with_when_gating():
    hook = user_shader_hook(SAVE_LOAD_SHADER)
    img = _img(8, 12)
    # NATIVE pass: w=12 < 500 -> saves 10x version, output unchanged
    out1 = run_hooks([hook], HookStage.NATIVE, img)
    assert out1.shape == img.shape
    np.testing.assert_allclose(np.asarray(out1), np.asarray(img))
    # MAIN pass: binds NATIVEBIG (120x80), downscales back via _texOff(0)
    out2 = run_hooks([hook], HookStage.RGB, out1)
    assert out2.shape == (4, 8, 12)[1:] == (8, 12) or \
        out2.shape[-2:] == (8, 12)
    # NATIVEBIG was a 10x nearest-ish upscale; sampling it back at the
    # original grid must reproduce the original
    np.testing.assert_allclose(np.asarray(out2)[:3], np.asarray(img),
                               atol=1e-6)


def test_when_gating_blocks_large_frames():
    hook = user_shader_hook(SAVE_LOAD_SHADER)
    img = _img(8, 600)                 # w >= 500: WHEN fails
    out = run_hooks([hook], HookStage.NATIVE, img)
    out = run_hooks([hook], HookStage.RGB, out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))


def test_disco_texture_shader():
    sh = parse_user_shader(DISCO_SHADER)
    assert "DISCO" in sh.textures
    tex = sh.textures["DISCO"]
    assert tex.data.shape == (3, 3, 4)
    assert tex.filter == "NEAREST" and tex.border == "REPEAT"
    np.testing.assert_allclose(tex.data[0, 0], [1, 0, 0, 1])  # ff0000ff
    np.testing.assert_allclose(tex.data[0, 1], [0, 1, 0, 1])

    hook = user_shader_hook(sh)
    img = _img(6, 9, seed=1)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    assert out.shape == (3, 6, 9)
    # every output pixel is one of the 9 palette colors
    pal = tex.data[..., :3].reshape(-1, 3)
    px = out.reshape(3, -1).T
    for p in px[:20]:
        assert np.min(np.abs(pal - p).sum(axis=1)) < 1e-5


def test_param_when_gating():
    hook = user_shader_hook(PARAM_SHADER)
    img = _img()
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    # first pass gated off (testconst=3 not > 30); second applies
    # intensity=1.0 -> identity
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)
    hook2 = user_shader_hook(PARAM_SHADER, parameters={"intensity": 2.0})
    out2 = np.asarray(run_hooks([hook2], HookStage.RGB, img))
    np.testing.assert_allclose(out2, 2 * np.asarray(img), atol=1e-5)
    # parameter clamping to MAXIMUM
    hook3 = user_shader_hook(PARAM_SHADER, parameters={"intensity": 1e6})
    assert hook3.parameters["intensity"] == 100.0


def test_unsharp_community_hook():
    """A realistic community-style unsharp hook (#define + texOff cross +
    PARAM) matches a numpy oracle."""
    hook = user_shader_hook(UNSHARP_REAL, parameters={"strength": 1.5})
    img = _img(10, 14, seed=2)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))

    x = np.asarray(img)
    pad = np.pad(x, [(0, 0), (1, 1), (1, 1)], mode="edge")
    blur = (pad[:, 1:-1, 2:] + pad[:, 1:-1, :-2] +
            pad[:, 2:, 1:-1] + pad[:, :-2, 1:-1]) / 4.0
    expect = x + (x - blur) * 1.5
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_glsl_subset_math():
    src = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    vec3 t = clamp(c.rgb * 2.0 - 0.25, 0.0, 1.0);
    float luma = dot(t, vec3(0.25, 0.5, 0.25));
    t = mix(t, vec3(luma), 0.5);
    t = pow(max(t, 0.0), vec3(1.2));
    return vec4(t, 1.0);
}
"""
    hook = user_shader_hook(src)
    img = _img(4, 6, seed=3)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.clip(np.asarray(img) * 2.0 - 0.25, 0, 1)
    luma = 0.25 * x[0] + 0.5 * x[1] + 0.25 * x[2]
    t = x + (luma[None] - x) * 0.5
    expect = np.power(np.maximum(t, 0), 1.2)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_data_dependent_sampling_rejected():
    src = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    return HOOKED_tex(HOOKED_pos + c.xy);
}
"""
    hook = user_shader_hook(src)
    img = _img()
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    # hook auto-disabled (reference rr->disabled_hooks), image unchanged
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


def test_renderer_integration():
    """A user shader runs inside the full jit-compiled Renderer."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    hook = user_shader_hook(UNSHARP_REAL)
    rng = np.random.default_rng(5)
    rgb = rng.random((16, 24, 3)).astype(np.float32)
    frame = frame_from_rgb(rgb, color=CSP_SRGB)
    params = RenderParams(peak_detect=None, dither=None,
                          linear_scaling=False, hooks=(hook,))
    out = np.asarray(Renderer()._render_once(
        frame, Target(w=24, h=16, color=CSP_SRGB), params))
    base = np.asarray(Renderer()._render_once(
        frame, Target(w=24, h=16, color=CSP_SRGB),
        RenderParams(peak_detect=None, dither=None,
                     linear_scaling=False)))
    assert out.shape == base.shape
    assert not np.allclose(out, base)   # the hook did something


FSRCNN_STYLE = """\
//!HOOK MAIN
//!BIND HOOKED
//!DESC separable 5-tap box via for loop (FSRCNNX-style tap loop)

vec4 hook()
{
    vec4 acc = vec4(0.0);
    for (int dx = -2; dx <= 2; dx++) {
        acc += HOOKED_texOff(vec2(dx, 0.0));
    }
    return acc / 5.0;
}
"""


def test_for_loop_hook():
    hook = user_shader_hook(FSRCNN_STYLE)
    img = _img(6, 12, seed=4)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    pad = np.pad(x, [(0, 0), (0, 0), (2, 2)], mode="edge")
    expect = sum(pad[:, :, k:k + 12] for k in range(5)) / 5.0
    np.testing.assert_allclose(out, expect, atol=1e-5)


IF_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    float luma = dot(c.rgb, vec3(0.299, 0.587, 0.114));
    vec3 t = c.rgb;
    if (luma > 0.5) {
        t = t * 0.5;
    } else {
        t = t + 0.1;
    }
    return vec4(t, 1.0);
}
"""


def test_per_pixel_if_hook():
    hook = user_shader_hook(IF_HOOK)
    img = _img(5, 7, seed=6)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    luma = 0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2]
    expect = np.where(luma[None] > 0.5, x * 0.5, x + 0.1)
    np.testing.assert_allclose(out, expect, atol=1e-6)


STATIC_IF_HOOK = """\
//!PARAM mode
//!TYPE DEFINE
1

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    if (mode == 1) {
        return c * 2.0;
    } else {
        return c * 0.5;
    }
}
"""


def test_static_if_with_define():
    hook = user_shader_hook(STATIC_IF_HOOK)
    img = _img(4, 6, seed=7)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    np.testing.assert_allclose(out, 2 * np.asarray(img), atol=1e-6)
    hook2 = user_shader_hook(STATIC_IF_HOOK, parameters={"mode": 0})
    out2 = np.asarray(run_hooks([hook2], HookStage.RGB, img))
    np.testing.assert_allclose(out2, 0.5 * np.asarray(img), atol=1e-6)


FSRCNNX_LIKE = r"""
//!DESC FSRCNNX-like feature extraction
//!HOOK LUMA
//!BIND HOOKED
//!SAVE FEATURE
//!COMPONENTS 4
//!WHEN OUTPUT.w LUMA.w / 1.2 >
vec4 hook() {
    vec4 res = vec4(0.0);
    for (int y = -1; y <= 1; y++) {
        for (int x = -1; x <= 1; x++) {
            float px = HOOKED_texOff(vec2(x, y)).x;
            res += px * vec4(0.1 * float(x + 2), 0.05 * float(y + 2),
                             0.02, 0.01);
        }
    }
    return max(res + vec4(0.01, -0.01, 0.02, 0.0), vec4(0.0));
}

//!DESC FSRCNNX-like mapping
//!HOOK LUMA
//!BIND FEATURE
//!SAVE FEATURE
//!COMPONENTS 4
//!WHEN OUTPUT.w LUMA.w / 1.2 >
vec4 hook() {
    vec4 a = FEATURE_texOff(vec2(-1.0, 0.0));
    vec4 b = FEATURE_texOff(vec2(1.0, 0.0));
    vec4 c = FEATURE_tex(FEATURE_pos);
    vec4 res = 0.25 * a + 0.25 * b + 0.5 * c;
    res.x = dot(res, vec4(0.25));
    return max(res, vec4(0.0));
}

//!DESC FSRCNNX-like sub-pixel reconstruction (2x luma)
//!HOOK LUMA
//!BIND HOOKED
//!BIND FEATURE
//!WIDTH LUMA.w 2 *
//!HEIGHT LUMA.h 2 *
//!WHEN OUTPUT.w LUMA.w / 1.2 >
vec4 hook() {
    vec4 f = FEATURE_tex(HOOKED_pos);
    float base = HOOKED_tex(HOOKED_pos).x;
    float detail = dot(f, vec4(0.4, 0.3, 0.2, 0.1));
    return vec4(base + 0.1 * detail, 0.0, 0.0, 1.0);
}
"""


def _yuv_frame(seed=0, h=64, w=96):
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem)
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    rng = np.random.default_rng(seed)
    y = (rng.random((h, w)) * 219 + 16).astype(np.uint8)
    u = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    v = (rng.random((h // 2, w // 2)) * 224 + 16).astype(np.uint8)
    return frame_from_yuv420p(
        y, u, v, repr=ColorRepr(sys=ColorSystem.BT_709,
                                levels=ColorLevels.LIMITED,
                                bits=BitEncoding(8, 8, 0)))


def test_fsrcnnx_class_luma_doubling_hook():
    """A 3-pass FSRCNNX-style compute hook: conv feature extraction into
    a 4-component //!SAVE texture, a mapping pass over it, and a 2x
    luma-doubling reconstruction pass (//!WIDTH LUMA.w 2 *) — runs at
    the LUMA_INPUT stage, resizes the reference grid, and is gated by
    //!WHEN on the render target ratio (reference custom_mpv.c:1594)."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.mpv_hooks import (parse_user_shader,
                                                 user_shader_hook)
    from libplacebo_tpu.render.renderer import (RenderParams, Renderer,
                                                Target)
    hook = user_shader_hook(parse_user_shader(FSRCNNX_LIKE))
    frame = _yuv_frame()
    h, w = 64, 96
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)
    params = RenderParams(upscaler="lanczos", hooks=(hook,))
    r = Renderer()
    out = np.asarray(r._render_once(frame, target, params))
    assert not r._disabled_hooks, "hook was auto-disabled"
    assert out.shape == (3, 2 * h, 2 * w)
    ref = np.asarray(Renderer()._render_once(
        frame, target, RenderParams(upscaler="lanczos")))
    assert np.abs(out - ref).max() > 1e-3   # the hook changed the luma

    # WHEN gate: 1:1 render bypasses every pass bit-exactly
    t1 = Target(w=w, h=h, color=CSP_SRGB, bit_depth=0)
    r2 = Renderer()
    out1 = np.asarray(r2._render_once(frame, t1, params))
    ref1 = np.asarray(Renderer()._render_once(
        frame, t1, RenderParams(upscaler="lanczos")))
    assert not r2._disabled_hooks
    np.testing.assert_array_equal(out1, ref1)


def test_const_array_tables():
    """const type[](...) weight/offset tables indexed by unrolled loop
    vars — the ravu/adaptive-sharpen pattern; per-pixel indices are
    rejected (they would be a gather)."""
    import jax.numpy as jnp
    from libplacebo_tpu.render.hooks import HookStage, run_hooks
    from libplacebo_tpu.render.mpv_hooks import (parse_user_shader,
                                                 user_shader_hook)
    SH = r"""
//!DESC array tables
//!HOOK LUMA
//!BIND HOOKED
vec4 hook() {
    const vec2 offsets[4] = vec2[](vec2(1.0, 0.0), vec2(-1.0, 0.0),
                                   vec2(0.0, 1.0), vec2(0.0, -1.0));
    const float W[4] = float[4](0.4, 0.3, 0.2, 0.1);
    float ws[2] = float[](0.25, 0.75);
    ws[0] = ws[0] + 0.05;
    float acc = 0.0;
    for (int i = 0; i < 4; i++) {
        acc += W[i] * HOOKED_texOff(offsets[i]).x;
    }
    float c = HOOKED_tex(HOOKED_pos).x;
    return vec4(mix(c, acc, ws[0]), 0.0, 0.0, 1.0);
}
"""
    hook = user_shader_hook(parse_user_shader(SH))
    img = jnp.asarray(np.random.default_rng(0).random((1, 32, 48),
                                                      np.float32))
    disabled = set()
    out = run_hooks([hook], HookStage.LUMA_INPUT, img, disabled)
    assert not disabled
    x = np.asarray(img)[0]
    p = np.pad(x, 1, mode="edge")

    def off(dy, dx):
        return p[1 + dy:1 + dy + 32, 1 + dx:1 + dx + 48]
    acc = 0.4 * off(0, 1) + 0.3 * off(0, -1) + 0.2 * off(1, 0) \
        + 0.1 * off(-1, 0)
    expect = x * 0.7 + acc * 0.3
    np.testing.assert_allclose(np.asarray(out)[0], expect, atol=1e-6)

    # data-dependent index must be rejected (auto-disabled)
    BAD = SH.replace("W[i]", "W[int(c * 3.0)]").replace(
        "float c = HOOKED_tex(HOOKED_pos).x;\n", "")
    BAD = BAD.replace("vec4 hook() {",
                      "vec4 hook() {\n    float c = "
                      "HOOKED_tex(HOOKED_pos).x;")
    hook2 = user_shader_hook(parse_user_shader(BAD))
    disabled2 = set()
    out2 = run_hooks([hook2], HookStage.LUMA_INPUT, img, disabled2)
    assert disabled2                     # rejected, frame unchanged
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(img))
