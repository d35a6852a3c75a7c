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


EARLY_RETURN_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    float luma = dot(c.rgb, vec3(0.299, 0.587, 0.114));
    if (luma > 0.5)
        return vec4(c.rgb * 0.25, 1.0);
    vec3 t = c.rgb + 0.1;
    if (luma < 0.2) {
        t = t * 2.0;
        return vec4(t, 1.0);
    }
    return vec4(t * 0.5, 1.0);
}
"""


def test_per_pixel_early_return():
    """Adaptive-sharpen-class early returns: lanes exit at the first
    satisfied per-pixel condition (reference compiles arbitrary GLSL,
    custom_mpv.c:1594)."""
    hook = user_shader_hook(EARLY_RETURN_HOOK)
    img = _img(5, 7, seed=9)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    luma = (0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2])[None]
    t = x + 0.1
    expect = np.where(luma > 0.5, x * 0.25,
                      np.where(luma < 0.2, t * 2.0, t * 0.5))
    np.testing.assert_allclose(out, expect, atol=1e-6)


BOTH_RETURN_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    if (c.r > 0.5) { return c * 2.0; } else { return c * 0.5; }
}
"""


def test_per_pixel_if_else_both_return():
    hook = user_shader_hook(BOTH_RETURN_HOOK)
    img = _img(4, 6, seed=10)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    expect = np.where(x[0][None] > 0.5, x * 2.0, x * 0.5)
    np.testing.assert_allclose(out, expect, atol=1e-6)


NESTED_RETURN_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    if (c.r > 0.3) {
        if (c.g > 0.5)
            return vec4(1.0, 0.0, 0.0, 1.0);
        c.b = c.b + 0.5;
    }
    return vec4(c.rgb, 1.0);
}
"""


def test_nested_per_pixel_early_return():
    hook = user_shader_hook(NESTED_RETURN_HOOK)
    img = _img(5, 6, seed=11)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    r, g, b = x[0], x[1], x[2]
    inner = (r > 0.3) & (g > 0.5)
    b2 = np.where(r > 0.3, b + 0.5, b)
    expect = np.where(inner[None], np.array([1.0, 0.0, 0.0])[:, None, None],
                      np.stack([r, g, b2]))
    np.testing.assert_allclose(out, expect, atol=1e-6)


LOOP_RETURN_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    for (int i = 0; i < 3; i++) {
        if (c.r > 0.8 - 0.25 * float(i))
            return vec4(0.1 * float(i + 1));
    }
    return vec4(c.rgb, 1.0);
}
"""


def test_early_return_inside_loop():
    """First-return-wins across unrolled loop iterations."""
    hook = user_shader_hook(LOOP_RETURN_HOOK)
    img = _img(5, 7, seed=12)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    r = x[0][None]
    expect = np.where(r > 0.8, 0.1,
                      np.where(r > 0.55, 0.2,
                               np.where(r > 0.3, 0.3,
                                        np.concatenate([x[:3]]))))
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


# ---------------------------------------------------------------------------
# RAVU-class hooks: data-dependent sampling of bounded //!TEXTURE LUTs
# (reference compiles arbitrary GLSL, custom_mpv.c:1594; the TPU lowering
# is one-/two-hot MXU matmuls against the small weight table). The shader
# text below is self-authored in the structure RAVU generators emit:
# structure-tensor eigenanalysis -> quantized (angle, strength, coherence)
# -> LUT row -> weighted taps; step2 interleaves the 4 subpixels 2x.
# ---------------------------------------------------------------------------

_RAVU_QA, _RAVU_QS, _RAVU_QC = 8, 4, 3
_RAVU_ROWS = _RAVU_QA * _RAVU_QS * _RAVU_QC
_RAVU_TAPS = 3
_PI = 3.141592653589793


def _ravu_lite_shader(lut):
    hexdata = lut.tobytes().hex()
    return f"""\
//!DESC ravu-lite-class step1
//!HOOK LUMA
//!BIND HOOKED
//!BIND ravu_lut
//!SAVE ravu_int
//!COMPONENTS 4
//!WHEN OUTPUT.w HOOKED.w / 1.2 >

#define L(x, y) HOOKED_texOff(vec2(x, y)).x

vec4 hook() {{
    vec3 abd = vec3(0.0);
    float gx, gy;
    gx = (L(0, 1) - L(0, -1)) / 2.0;
    gy = (L(1, 0) - L(-1, 0)) / 2.0;
    abd += vec3(gx * gx, gx * gy, gy * gy) * 0.5;
    gx = (L(1, 1) - L(-1, 1)) / 2.0;
    gy = (L(1, 1) - L(1, -1)) / 2.0;
    abd += vec3(gx * gx, gx * gy, gy * gy) * 0.25;
    gx = (L(-1, -1) - L(1, -1)) / 2.0;
    gy = (L(-1, 1) - L(-1, -1)) / 2.0;
    abd += vec3(gx * gx, gx * gy, gy * gy) * 0.25;
    float a = abd.x, b = abd.y, d = abd.z;
    float T = a + d, D = a * d - b * b;
    float delta = sqrt(max(T * T / 4.0 - D, 0.0));
    float L1 = T / 2.0 + delta, L2 = T / 2.0 - delta;
    float sqrtL1 = sqrt(L1), sqrtL2 = sqrt(L2);
    float theta = mix(mod(atan(b, L1 - a) + {_PI}, {_PI}), 0.0, abs(b) < 1.192092896e-7);
    float lambda = sqrtL1;
    float mu = mix((sqrtL1 - sqrtL2) / (sqrtL1 + sqrtL2), 0.0, sqrtL1 + sqrtL2 < 1.192092896e-7);
    float angle = floor(theta / {_PI} * {_RAVU_QA}.0);
    float strength = mix(mix(0.0, 1.0, lambda >= 0.004), mix(2.0, 3.0, lambda >= 0.05), lambda >= 0.016);
    float coherence = mix(mix(0.0, 1.0, mu >= 0.25), 2.0, mu >= 0.5);
    float coord_y = ((angle * {_RAVU_QS}.0 + strength) * {_RAVU_QC}.0 + coherence + 0.5) / {_RAVU_ROWS}.0;
    vec4 res = vec4(0.0);
    res += L(-1, -1) * texture(ravu_lut, vec2(0.5 / {_RAVU_TAPS}.0, coord_y));
    res += L(0, 0) * texture(ravu_lut, vec2(1.5 / {_RAVU_TAPS}.0, coord_y));
    res += L(1, 1) * texture(ravu_lut, vec2(2.5 / {_RAVU_TAPS}.0, coord_y));
    return res;
}}

//!DESC ravu-lite-class step2 (2x interleave)
//!HOOK LUMA
//!BIND ravu_int
//!WIDTH HOOKED.w 2 *
//!HEIGHT HOOKED.h 2 *

vec4 hook() {{
    vec2 pos = HOOKED_pos * ravu_int_size;
    vec2 sub = fract(pos);
    int idx = int(sub.y > 0.5) * 2 + int(sub.x > 0.5);
    vec2 tc = (floor(pos) + vec2(0.5)) * ravu_int_pt;
    vec4 q = ravu_int_tex(tc);
    return vec4(q[idx], 0.0, 0.0, 1.0);
}}

//!TEXTURE ravu_lut
//!SIZE {_RAVU_TAPS} {_RAVU_ROWS}
//!FORMAT rgba16hf
//!FILTER NEAREST
{hexdata}
"""


def _ravu_lite_oracle(img, lut):
    """numpy mirror of _ravu_lite_shader. img: (H, W) f32."""
    H, W = img.shape
    lutf = lut.astype(np.float32)

    def L(x, y):
        ys = np.clip(np.arange(H) + y, 0, H - 1)
        xs = np.clip(np.arange(W) + x, 0, W - 1)
        return img[np.ix_(ys, xs)]

    abd = np.zeros((3, H, W), np.float32)
    for (gx, gy, w) in [
        ((L(0, 1) - L(0, -1)) / 2, (L(1, 0) - L(-1, 0)) / 2, 0.5),
        ((L(1, 1) - L(-1, 1)) / 2, (L(1, 1) - L(1, -1)) / 2, 0.25),
        ((L(-1, -1) - L(1, -1)) / 2, (L(-1, 1) - L(-1, -1)) / 2, 0.25),
    ]:
        abd += np.stack([gx * gx, gx * gy, gy * gy]) * np.float32(w)
    a, b, d = abd
    T = a + d
    D = a * d - b * b
    delta = np.sqrt(np.maximum(T * T / 4 - D, 0))
    L1 = T / 2 + delta
    s1 = np.sqrt(L1)
    s2 = np.sqrt(T / 2 - delta)
    theta = np.where(np.abs(b) < 1.192092896e-7, 0.0,
                     np.mod(np.arctan2(b, L1 - a) + _PI, _PI))
    mu = np.where(s1 + s2 < 1.192092896e-7, 0.0,
                  (s1 - s2) / np.where(s1 + s2 == 0, 1, s1 + s2))
    angle = np.floor(theta / _PI * _RAVU_QA)
    strength = np.where(s1 >= 0.016, np.where(s1 >= 0.05, 3.0, 2.0),
                        np.where(s1 >= 0.004, 1.0, 0.0))
    coherence = np.where(mu >= 0.5, 2.0, np.where(mu >= 0.25, 1.0, 0.0))
    row = np.clip(((angle * _RAVU_QS + strength) * _RAVU_QC + coherence
                   ).astype(np.int64), 0, _RAVU_ROWS - 1)
    res = np.zeros((4, H, W), np.float32)
    for t, (x, y) in enumerate([(-1, -1), (0, 0), (1, 1)]):
        res += L(x, y)[None] * np.moveaxis(lutf[row, t, :], -1, 0)
    out = np.zeros((2 * H, 2 * W), np.float32)
    out[0::2, 0::2] = res[0]
    out[0::2, 1::2] = res[1]
    out[1::2, 0::2] = res[2]
    out[1::2, 1::2] = res[3]
    return out


def test_ravu_lite_class_hook():
    """RAVU-lite-class doubling: traced LUT row index (the pattern the
    r2 translator rejected), NEAREST //!TEXTURE sampled by computed
    coords, 2-pass SAVE + subpixel interleave with a dynamic vector
    index — all vs a numpy oracle."""
    rng = np.random.default_rng(42)
    lut = rng.uniform(-0.2, 0.5,
                      (_RAVU_ROWS, _RAVU_TAPS, 4)).astype(np.float16)
    H, W = 24, 40
    img = rng.uniform(0, 1, (H, W)).astype(np.float32)
    hook = user_shader_hook(parse_user_shader(_ravu_lite_shader(lut)))
    disabled = set()
    out = run_hooks([hook], HookStage.LUMA_INPUT, jnp.asarray(img[None]),
                    disabled, dst_w=2 * W, dst_h=2 * H)
    assert not disabled
    out = np.asarray(out)
    assert out.shape == (1, 2 * H, 2 * W)
    np.testing.assert_allclose(out[0], _ravu_lite_oracle(img, lut),
                               atol=2e-5)


def test_ravu_lite_when_gate_respects_output():
    """The same hook is a no-op when the render is not upscaling."""
    rng = np.random.default_rng(1)
    lut = rng.uniform(-0.2, 0.5,
                      (_RAVU_ROWS, _RAVU_TAPS, 4)).astype(np.float16)
    H, W = 16, 24
    img = jnp.asarray(rng.uniform(0, 1, (1, H, W)).astype(np.float32))
    hook = user_shader_hook(parse_user_shader(_ravu_lite_shader(lut)))
    out = run_hooks([hook], HookStage.LUMA_INPUT, img,
                    dst_w=W, dst_h=H)          # 1x: WHEN fails
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_ravu_zoom_class_hook():
    """zoom-class: arbitrary-ratio upscale with a LINEAR-filtered LUT
    indexed by (host subpixel x, traced strength + host subpixel y) and
    the source sampled at floor()-derived positions (computed but
    host-resolvable -> static gathers)."""
    rng = np.random.default_rng(7)
    ZR, ZC = 4, 16
    zlut = rng.uniform(0.0, 0.5, (ZR, ZC, 4)).astype(np.float16)
    shader_text = f"""\
//!DESC ravu-zoom-class
//!HOOK LUMA
//!BIND HOOKED
//!BIND zoom_lut
//!WIDTH OUTPUT.w
//!HEIGHT OUTPUT.h

#define S(x, y) HOOKED_tex((base + vec2(x, y) + vec2(0.5)) * HOOKED_pt).x

vec4 hook() {{
    vec2 pos = HOOKED_pos * HOOKED_size - vec2(0.5);
    vec2 base = floor(pos);
    vec2 sub = pos - base;
    float gx = S(1.0, 0.0) - S(-1.0, 0.0);
    float gy = S(0.0, 1.0) - S(0.0, -1.0);
    float strength = min(floor(sqrt(gx * gx + gy * gy) * 4.0), 3.0);
    vec4 w = texture(zoom_lut, vec2(sub.x, (strength + sub.y) / {ZR}.0));
    float res = S(0.0, 0.0) * w.x + S(1.0, 0.0) * w.y + S(0.0, 1.0) * w.z + S(1.0, 1.0) * w.w;
    return vec4(res, 0.0, 0.0, 1.0);
}}

//!TEXTURE zoom_lut
//!SIZE {ZC} {ZR}
//!FORMAT rgba16hf
//!FILTER LINEAR
{zlut.tobytes().hex()}
"""
    H, W, OH, OW = 24, 40, 40, 64
    img = rng.uniform(0, 1, (H, W)).astype(np.float32)
    hook = user_shader_hook(parse_user_shader(shader_text))
    disabled = set()
    out = np.asarray(run_hooks([hook], HookStage.LUMA_INPUT,
                               jnp.asarray(img[None]), disabled,
                               dst_w=OW, dst_h=OH))
    assert not disabled
    assert out.shape == (1, OH, OW)

    # oracle
    zl = zlut.astype(np.float32)
    ux = ((np.arange(OW) + 0.5) / OW).astype(np.float32)
    uy = ((np.arange(OH) + 0.5) / OH).astype(np.float32)
    posx = ux * W - 0.5
    posy = uy * H - 0.5
    bx = np.floor(posx)[None, :]
    by = np.floor(posy)[:, None]
    sx = (posx - np.floor(posx))[None, :]
    sy = (posy - np.floor(posy))[:, None]

    def S(x, y):
        px, py = bx + x, by + y
        x0, y0 = np.floor(px), np.floor(py)
        fx = (px - x0).astype(np.float32)
        fy = (py - y0).astype(np.float32)

        def at(iy, ix):
            return img[np.clip(iy, 0, H - 1).astype(np.int64),
                       np.clip(ix, 0, W - 1).astype(np.int64)]
        top = at(y0, x0) + (at(y0, x0 + 1) - at(y0, x0)) * fx
        bot = at(y0 + 1, x0) + (at(y0 + 1, x0 + 1) - at(y0 + 1, x0)) * fx
        return top + (bot - top) * fy

    gx = S(1, 0) - S(-1, 0)
    gy = S(0, 1) - S(0, -1)
    strength = np.minimum(np.floor(np.sqrt(gx * gx + gy * gy) * 4.0), 3.0)
    cy = (strength + sy) / ZR
    cx = np.broadcast_to(sx, cy.shape)
    px, py = cx * ZC - 0.5, cy * ZR - 0.5
    x0, y0 = np.floor(px), np.floor(py)
    fx = (px - x0).astype(np.float32)[..., None]
    fy = (py - y0).astype(np.float32)[..., None]

    def lat(iy, ix):
        return zl[np.clip(iy, 0, ZR - 1).astype(np.int64),
                  np.clip(ix, 0, ZC - 1).astype(np.int64)]
    top = lat(y0, x0) + (lat(y0, x0 + 1) - lat(y0, x0)) * fx
    bot = lat(y0 + 1, x0) + (lat(y0 + 1, x0 + 1) - lat(y0 + 1, x0)) * fx
    w4 = top + (bot - top) * fy
    ref = (S(0, 0) * w4[..., 0] + S(1, 0) * w4[..., 1] +
           S(0, 1) * w4[..., 2] + S(1, 1) * w4[..., 3])
    np.testing.assert_allclose(out[0], ref, atol=5e-5)


def test_dynamic_sampling_of_image_texture_still_rejected():
    """Traced coords into a frame-sized texture keep the clear error
    (auto-disable), and an oversized dynamic //!TEXTURE is refused."""
    src = """\
//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    return HOOKED_tex(HOOKED_pos + c.xy * HOOKED_pt);
}
"""
    hook = user_shader_hook(src)
    img = jnp.asarray(np.random.default_rng(0)
                      .random((3, 16, 24), np.float32))
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled

    # dynamic 2D (both axes traced) lookup beyond the flat cap
    big = np.zeros((128, 64, 4), np.float16)     # 8192 > 4096 texels
    src2 = f"""\
//!HOOK MAIN
//!BIND HOOKED
//!BIND big_lut
vec4 hook()
{{
    vec4 c = HOOKED_texOff(0);
    return texture(big_lut, c.xy);
}}

//!TEXTURE big_lut
//!SIZE 64 128
//!FORMAT rgba16hf
{big.tobytes().hex()}
"""
    hook2 = user_shader_hook(parse_user_shader(src2))
    disabled2 = set()
    out2 = run_hooks([hook2], HookStage.RGB, img, disabled2)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(img))
    assert hook2.signature in disabled2


# ---------------------------------------------------------------------------
# //!BUFFER blocks (reference parse_buf, custom_mpv.c:500-616)
# ---------------------------------------------------------------------------

def _f32_hex(*vals):
    return b"".join(np.float32(v).tobytes() for v in vals).hex()


def _uniform_buffer_shader():
    # std140: gain@0, tint@16 (vec3 aligns 16), lut[2] stride 16 @32/48
    import struct
    payload = bytearray(64)
    struct.pack_into("<f", payload, 0, 2.0)              # gain
    struct.pack_into("<3f", payload, 16, 0.1, 0.2, 0.3)  # tint
    struct.pack_into("<f", payload, 32, 0.05)            # lut[0]
    struct.pack_into("<f", payload, 48, 0.07)            # lut[1]
    return f"""\
//!BUFFER params_buf
//!VAR float gain
//!VAR vec3 tint
//!VAR float lut[2]
{bytes(payload).hex()}

//!HOOK MAIN
//!BIND HOOKED
//!DESC apply uniform-buffer gain/tint/lut

vec4 hook()
{{
    vec4 c = HOOKED_texOff(0);
    return vec4(c.x * gain + lut[0], c.y + tint.y + lut[1],
                c.z + tint.z, 1.0);
}}
"""


def test_buffer_uniform_parse_std140():
    sh = parse_user_shader(_uniform_buffer_shader())
    buf = sh.buffers["params_buf"]
    assert not buf.storage
    assert [v.name for v in buf.vars] == ["gain", "tint", "lut"]
    assert buf.values["gain"] == pytest.approx(2.0)
    np.testing.assert_allclose(buf.values["tint"], [0.1, 0.2, 0.3],
                               rtol=1e-6)
    np.testing.assert_allclose(buf.values["lut"].ravel(), [0.05, 0.07],
                               rtol=1e-6)


def test_buffer_uniform_vars_in_body():
    hook = user_shader_hook(_uniform_buffer_shader())
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((3, 8, 12)).astype(np.float32))
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    ref = np.asarray(img)
    exp = np.stack([ref[0] * 2.0 + 0.05, ref[1] + 0.2 + 0.07,
                    ref[2] + 0.3])
    np.testing.assert_allclose(out, exp, rtol=1e-5, atol=1e-6)


STORAGE_AVG_SHADER = """\
//!BUFFER stats
//!STORAGE
//!VAR float total

//!HOOK MAIN
//!BIND HOOKED
//!DESC accumulate luma sum (atomicAdd over all invocations)

vec4 hook()
{
    atomicAdd(total, HOOKED_texOff(0).x);
    return HOOKED_texOff(0);
}

//!HOOK MAIN
//!BIND HOOKED
//!DESC subtract the frame-average of channel 0

vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    float avg = total / (HOOKED_size.x * HOOKED_size.y);
    return vec4(c.x - avg, c.y, c.z, 1.0);
}
"""


def test_buffer_storage_atomic_add_across_passes():
    """A STORAGE buffer written by pass 1 (atomicAdd = sum over the
    output grid) is visible to pass 2 within the same frame."""
    hook = user_shader_hook(STORAGE_AVG_SHADER)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((3, 6, 10)).astype(np.float32))
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    ref = np.asarray(img)
    exp = ref.copy()
    exp[0] = ref[0] - ref[0].mean()
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-5)


def test_buffer_storage_resets_each_frame():
    """Unlike the reference's persistent GPU buffer, values re-init
    per frame (documented deviation) — two renders give equal output."""
    hook = user_shader_hook(STORAGE_AVG_SHADER)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((3, 6, 10)).astype(np.float32))
    a = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    b = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    np.testing.assert_array_equal(a, b)


def test_buffer_uniform_assignment_rejected():
    bad = _uniform_buffer_shader().replace(
        "vec4 c = HOOKED_texOff(0);",
        "vec4 c = HOOKED_texOff(0); gain = 3.0;")
    hook = user_shader_hook(bad)
    img = jnp.zeros((3, 4, 4), jnp.float32)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    # hook auto-disabled with the clean error, image unchanged
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


def test_buffer_storage_per_pixel_write_rejected():
    bad = STORAGE_AVG_SHADER.replace(
        "atomicAdd(total, HOOKED_texOff(0).x);",
        "total = HOOKED_texOff(0).x;")
    hook = user_shader_hook(bad)
    img = jnp.zeros((3, 4, 4), jnp.float32)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


def test_buffer_storage_empty_payload_zero_init():
    sh = parse_user_shader(STORAGE_AVG_SHADER)
    assert sh.buffers["stats"].storage
    assert sh.buffers["stats"].values["total"] == 0.0


# ---------------------------------------------------------------------------
# //!COMPUTE hooks (reference custom_mpv.c:265-285 parse, 1482-1503
# dispatch).  One invocation per output pixel; gl_* built-ins are host
# coordinate grids; workgroup-shared arrays replay their cooperative
# fill loop at each read (see _BodyRunner docstring).
# ---------------------------------------------------------------------------

COMPUTE_IDENTITY_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
//!COMPUTE 8 8
void hook()
{
    vec4 c = HOOKED_texOff(0);
    imageStore(out_image, ivec2(gl_GlobalInvocationID.xy), c * 2.0);
}
"""


def test_compute_identity_store():
    hook = user_shader_hook(COMPUTE_IDENTITY_HOOK)
    img = _img(9, 13, seed=3)           # not a multiple of the block
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    np.testing.assert_allclose(out, 2 * np.asarray(img), atol=1e-6)


COMPUTE_IDS_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
//!COMPUTE 8 4
void hook()
{
    imageStore(out_image, ivec2(gl_GlobalInvocationID.xy),
               vec4(float(gl_LocalInvocationID.x),
                    float(gl_WorkGroupID.y),
                    float(gl_LocalInvocationIndex),
                    float(gl_WorkGroupSize.x)) / 64.0);
}
"""


def test_compute_invocation_ids():
    hook = user_shader_hook(COMPUTE_IDS_HOOK)
    h, w = 7, 19
    img = _img(h, w, seed=1)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    X, Y = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(out[0], (X % 8) / 64.0, atol=1e-6)
    np.testing.assert_allclose(out[1], (Y // 4) / 64.0, atol=1e-6)
    np.testing.assert_allclose(out[2], ((Y % 4) * 8 + X % 8) / 64.0,
                               atol=1e-6)


# Krig-class cooperative tile cache: strided shared fill + barrier +
# neighborhood reads + per-pixel store.
COMPUTE_SHARED_BLUR_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
//!COMPUTE 16 8
#define TW 16
#define TH 8
#define PAD 1
#define SW (TW + 2*PAD)
#define SH (TH + 2*PAD)
shared float cache[SW*SH];
void hook()
{
    ivec2 base = ivec2(gl_WorkGroupID.xy) * ivec2(TW, TH)
                 - ivec2(PAD, PAD);
    for (uint id = gl_LocalInvocationIndex; id < uint(SW*SH);
         id += uint(TW*TH)) {
        ivec2 rel = ivec2(int(id) % SW, int(id) / SW);
        vec2 c = (vec2(base + rel) + vec2(0.5)) * HOOKED_pt;
        cache[int(id)] = HOOKED_tex(c).x;
    }
    barrier();
    int idx = (int(gl_LocalInvocationID.y) + PAD) * SW
              + int(gl_LocalInvocationID.x) + PAD;
    float sum = 0.0;
    for (int dy = -1; dy <= 1; dy++) {
        for (int dx = -1; dx <= 1; dx++) {
            sum += cache[idx + dy * SW + dx];
        }
    }
    imageStore(out_image, ivec2(gl_GlobalInvocationID.xy),
               vec4(sum / 9.0, 0.0, 0.0, 1.0));
}
"""


def test_compute_shared_fill_replay():
    hook = user_shader_hook(COMPUTE_SHARED_BLUR_HOOK)
    h, w = 24, 37                       # partial workgroups at edges
    img = _img(h, w, seed=5)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)[0]
    pad = np.pad(x, 1, mode="edge")     # CLAMP border
    expect = sum(pad[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
                 for dy in (-1, 0, 1) for dx in (-1, 0, 1)) / 9.0
    np.testing.assert_allclose(out[0], expect, atol=1e-5)
    np.testing.assert_allclose(out[1], 0.0, atol=1e-6)


COMPUTE_GUARD_HOOK = """\
//!HOOK MAIN
//!BIND HOOKED
//!COMPUTE 8 8
void hook()
{
    if (gl_GlobalInvocationID.x >= 4u) {
        return;
    }
    imageStore(out_image, ivec2(gl_GlobalInvocationID.xy),
               HOOKED_texOff(0));
}
"""


def test_compute_oob_guard_bare_return():
    """`if (...) return;` suppresses later stores on returned lanes;
    unstored pixels read 0 (undefined in GLSL, zeroed here)."""
    hook = user_shader_hook(COMPUTE_GUARD_HOOK)
    img = _img(6, 8, seed=9)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img))
    x = np.asarray(img)
    np.testing.assert_allclose(out[:, :, :4], x[:, :, :4], atol=1e-6)
    np.testing.assert_allclose(out[:, :, 4:], 0.0, atol=1e-6)


FOUR_ARG_COMPUTE = """\
//!HOOK MAIN
//!BIND HOOKED
//!COMPUTE 16 8 8 8
void hook()
{
    ivec2 base = ivec2(gl_WorkGroupID.xy) * ivec2(16, 8);
    ivec2 local = ivec2(gl_LocalInvocationID.xy);
    for (int i = 0; i < 2; i++) {
        ivec2 pos = base + ivec2(local.x * 2 + i, local.y);
        vec4 c = texelFetch(HOOKED, pos, 0);
        imageStore(out_image, pos, c * 0.5);
    }
}
"""


def test_compute_threads_neq_block():
    """4-arg //!COMPUTE (reference custom_mpv.c:265-285): each 8x8
    thread group covers a 16x8 pixel block — every invocation stores
    two pixels.  Previously rejected; now runs and matches the
    halved-image oracle (OOB stores at the right edge are dropped,
    like GLSL's no-op out-of-bounds imageStore)."""
    hook = user_shader_hook(FOUR_ARG_COMPUTE)
    img = _img(16, 24, seed=2)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    assert not disabled
    np.testing.assert_allclose(np.asarray(out), np.asarray(img) * 0.5,
                               atol=1e-7)


def test_compute_threads_neq_block_in_renderer():
    """The 4-arg form runs inside the jit-traced pipeline."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import (Renderer, RenderParams,
                                                Target)
    hook = user_shader_hook(FOUR_ARG_COMPUTE)
    frame = _yuv_frame(seed=23, h=32, w=48)
    target = Target(w=48, h=32, color=CSP_SRGB, bit_depth=0)
    r = Renderer()
    out = np.asarray(r._render_once(frame, target, RenderParams(
        hooks=(hook,), peak_detect=None)))
    assert not r._disabled_hooks
    ref = np.asarray(Renderer()._render_once(frame, target, RenderParams(
        peak_detect=None)))
    assert np.isfinite(out).all()
    assert np.abs(out - ref).max() > 1e-3   # the halving took effect


def test_compute_hook_inside_renderer():
    """A compute hook runs inside the jit-traced render pipeline."""
    from libplacebo_tpu.render.frame import frame_from_rgb
    from libplacebo_tpu.render.renderer import (Renderer, RenderParams,
                                                Target)

    rng = np.random.default_rng(11)
    img = rng.random((16, 24, 3)).astype(np.float32)
    hook = user_shader_hook(COMPUTE_IDENTITY_HOOK.replace(
        "c * 2.0", "c * 0.5"))
    rr = Renderer()
    frame = frame_from_rgb(img)
    tgt = Target(w=24, h=16)
    base = np.asarray(rr.render(frame, tgt,
                                RenderParams(peak_detect=None)))
    hooked = np.asarray(rr.render(
        frame, tgt, RenderParams(peak_detect=None, hooks=(hook,))))
    assert np.isfinite(hooked).all()
    assert not np.allclose(base, hooked)


# ---------------------------------------------------------------------------
# atomicAdd predication (round-4 advisor fix): lanes excluded by a
# compute-mode early `return;` or by enclosing traced if-branches must
# not contribute — GLSL never executes the add for them.
# ---------------------------------------------------------------------------

ATOMIC_GUARDED_COMPUTE = """\
//!BUFFER stats
//!STORAGE
//!VAR float total

//!HOOK MAIN
//!BIND HOOKED
//!COMPUTE 8 8
void hook()
{
    if (gl_GlobalInvocationID.x >= 5.0) return;
    atomicAdd(total, 1.0);
    imageStore(out_image, ivec2(gl_GlobalInvocationID.xy),
               HOOKED_texOff(0));
}

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    return vec4(total, 0.0, 0.0, 1.0);
}
"""


def test_atomic_add_respects_compute_dead_mask():
    """A guard excluding lanes before atomicAdd(total, 1.0) must count
    only the surviving lanes (was: all H*W lanes)."""
    hook = user_shader_hook(ATOMIC_GUARDED_COMPUTE)
    img = _img(6, 10, seed=3)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    # 5 surviving columns x 6 rows = 30 adds of 1.0
    np.testing.assert_allclose(out[0], 30.0, rtol=1e-6)


ATOMIC_TRACED_IF = """\
//!BUFFER stats
//!STORAGE
//!VAR float total

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
    }
    return c;
}

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    return vec4(total, 0.0, 0.0, 1.0);
}
"""


def test_atomic_add_respects_traced_if_mask():
    """atomicAdd inside a per-pixel (traced) if-branch counts only the
    lanes where the condition holds."""
    hook = user_shader_hook(ATOMIC_TRACED_IF)
    img = _img(6, 10, seed=4)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    expect = float(np.sum(np.asarray(img)[0] > 0.5))
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


ATOMIC_IF_ELSE_BOTH = ATOMIC_TRACED_IF.replace(
    """    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
    }""",
    """    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
    } else {
        atomicAdd(total, 10.0);
    }""")


def test_atomic_add_traced_if_else_composes():
    """Adds in BOTH branches of a traced if/else compose sequentially
    (then-count*1 + else-count*10)."""
    hook = user_shader_hook(ATOMIC_IF_ELSE_BOTH)
    img = _img(6, 10, seed=5)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    n_then = float(np.sum(np.asarray(img)[0] > 0.5))
    n_else = 60.0 - n_then
    np.testing.assert_allclose(out[0], n_then + 10.0 * n_else, rtol=1e-5)


def test_atomic_add_survives_branch_return():
    """Lanes that atomicAdd and then `return <value>;` still added."""
    shader = ATOMIC_TRACED_IF.replace(
        """    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
    }""",
        """    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
        return c;
    }""")
    hook = user_shader_hook(shader)
    img = _img(6, 10, seed=6)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    expect = float(np.sum(np.asarray(img)[0] > 0.5))
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


STORAGE_PLAIN_COND_ASSIGN = """\
//!BUFFER stats
//!STORAGE
//!VAR float total
//!VAR float flag

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    atomicAdd(total, HOOKED_texOff(0).x);
    return HOOKED_texOff(0);
}

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    if (total > %s) {
        flag = 1.0;
    }
    return vec4(flag, total, 0.0, 1.0);
}
"""


@pytest.mark.parametrize("thresh,expect", [("1.0", 1.0), ("1e9", 0.0)])
def test_storage_plain_assign_keeps_condition(thresh, expect):
    """A PLAIN conditional assignment to a STORAGE member under a
    uniform traced condition must where-merge — the r4 bufw exemption
    applied it unconditionally (ADVICE r4: `if (c) flag = 1.0;` with a
    false condition still set flag)."""
    hook = user_shader_hook(STORAGE_PLAIN_COND_ASSIGN % thresh)
    img = _img(6, 10, seed=8)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


def test_storage_plain_assign_per_pixel_cond_rejected():
    """A plain assignment to a STORAGE member under a PER-PIXEL traced
    condition is a data race in GLSL too — it must raise the clear
    _collect_buf_writes error (auto-disable), not silently drop the
    condition."""
    shader = """\
//!BUFFER stats
//!STORAGE
//!VAR float flag

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    if (c.x > 0.5) {
        flag = 5.0;
    }
    return c;
}
"""
    hook = user_shader_hook(shader)
    img = _img(6, 10, seed=9)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


ATOMIC_TWO_SIBLING_IFS = ATOMIC_TRACED_IF.replace(
    """    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
    }""",
    """    if (c.x > 0.5) {
        atomicAdd(total, 1.0);
    }
    if (c.y > 0.5) {
        atomicAdd(total, 10.0);
    }""")


def test_atomic_add_two_sibling_ifs_same_member():
    """A second per-pixel if atomicAdd'ing a member already added by an
    earlier sibling if must stay exempt from the where-merge (the set
    delta missed repeat adds, wrongly where-merging the scalar carry
    with a per-pixel condition and auto-disabling the shader)."""
    hook = user_shader_hook(ATOMIC_TWO_SIBLING_IFS)
    img = _img(6, 10, seed=10)
    disabled = set()
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, disabled))
    assert not disabled
    a = np.asarray(img)
    expect = float(np.sum(a[0] > 0.5)) + 10.0 * float(np.sum(a[1] > 0.5))
    np.testing.assert_allclose(out[0], expect, rtol=1e-6)


STORAGE_ATOMIC_THEN_PLAIN_ELSE = """\
//!BUFFER stats
//!STORAGE
//!VAR float total
//!VAR float count

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    atomicAdd(total, HOOKED_texOff(0).x);
    return HOOKED_texOff(0);
}

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    if (total > %s) {
        atomicAdd(count, 1.0);
    } else {
        count = 5.0;
    }
    return vec4(count, total, 0.0, 1.0);
}
"""


@pytest.mark.parametrize("thresh,expect_count", [("1.0", 60.0),
                                                 ("1e9", 5.0)])
def test_atomic_then_plain_else_keeps_condition(thresh, expect_count):
    """atomicAdd in the then-branch with a PLAIN assignment in the else
    branch under a uniform traced condition: the else assignment must
    apply only when the condition is false (it was kept unconditionally
    because the member was in the sequential-compose set)."""
    hook = user_shader_hook(STORAGE_ATOMIC_THEN_PLAIN_ELSE % thresh)
    img = _img(6, 10, seed=11)
    disabled = set()
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, disabled))
    assert not disabled
    np.testing.assert_allclose(out[0], expect_count, rtol=1e-6)


def test_atomic_then_plain_else_per_pixel_rejected():
    """Same mixed atomic/plain if-else under a PER-PIXEL condition is a
    data race in GLSL too — clear error + auto-disable, not a silently
    dropped condition."""
    shader = """\
//!BUFFER stats
//!STORAGE
//!VAR float count

//!HOOK MAIN
//!BIND HOOKED
vec4 hook()
{
    vec4 c = HOOKED_texOff(0);
    if (c.x > 0.5) {
        atomicAdd(count, 1.0);
    } else {
        count = 5.0;
    }
    return c;
}
"""
    hook = user_shader_hook(shader)
    img = _img(6, 10, seed=12)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


def test_compute_conditional_value_return_rejected():
    """A conditional `return <value>;` inside a compute shader is a
    clear error (was: silently dropped)."""
    bad = COMPUTE_IDENTITY_HOOK.replace(
        "vec4 c = HOOKED_texOff(0);",
        "vec4 c = HOOKED_texOff(0);\n"
        "    if (c.x > 0.5) return c;")
    hook = user_shader_hook(bad)
    img = _img(6, 8, seed=7)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


# ---------------------------------------------------------------------------
# //!OFFSET (+ ALIGN) — reference custom_mpv.c:1533-1551: a pass's
# declared offset shifts the hooked texture's sampling rect so the main
# scaler compensates.  Oracle: rect_new = s*rect_old + offset, i.e. a
# doubling pass with OFFSET -0.5 -0.5 equals the same hook without the
# offset rendered with the source crop pre-shifted by -0.25 texels.
# ---------------------------------------------------------------------------

LUMA_DOUBLER_OFFSET = """\
//!HOOK LUMA
//!BIND HOOKED
//!WIDTH LUMA.w 2 *
//!HEIGHT LUMA.h 2 *
//!OFFSET -0.5 -0.5
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
"""


def _render(frame, target, params):
    from libplacebo_tpu.render.renderer import Renderer
    r = Renderer()
    out = np.asarray(r._render_once(frame, target, params))
    return out, r


def _yuv_frame_gray_chroma(seed=0, h=64, w=96):
    """Random luma, CONSTANT (gray) chroma: constant planes are
    resample-shift-invariant, so a luma-texture //!OFFSET becomes
    exactly equivalent to a crop shift (the reference shifts only the
    hooked plane's rect, NOT the other planes — a plain crop shift
    would move chroma too, renderer.c:1823-1838)."""
    from libplacebo_tpu.core.colorspace import (BitEncoding, ColorLevels,
                                                ColorRepr, ColorSystem)
    from libplacebo_tpu.render.frame import frame_from_yuv420p
    rng = np.random.default_rng(seed)
    y = (rng.random((h, w)) * 219 + 16).astype(np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    return frame_from_yuv420p(
        y, u, v, repr=ColorRepr(sys=ColorSystem.BT_709,
                                levels=ColorLevels.LIMITED,
                                bits=BitEncoding(8, 8, 0)))


def test_offset_on_doubling_hook_shifts_crop():
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.render.renderer import RenderParams, Target

    h, w = 32, 48
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)

    hook_off = user_shader_hook(LUMA_DOUBLER_OFFSET)
    hook_plain = user_shader_hook(
        LUMA_DOUBLER_OFFSET.replace("//!OFFSET -0.5 -0.5\n", ""))

    frame = _yuv_frame_gray_chroma(seed=9, h=h, w=w)
    out, r = _render(frame, target, RenderParams(
        upscaler="lanczos", hooks=(hook_off,)))
    assert not r._disabled_hooks

    # oracle: same hook w/o offset, crop pre-shifted by offset/scale
    # (rect_new = 2*rect + (-0.5)  <=>  crop shifted by -0.25)
    frame2 = _yuv_frame_gray_chroma(seed=9, h=h, w=w)
    frame2.crop = RectF(-0.25, -0.25, w - 0.25, h - 0.25)
    oracle, r2 = _render(frame2, target, RenderParams(
        upscaler="lanczos", hooks=(hook_plain,)))
    assert not r2._disabled_hooks
    np.testing.assert_allclose(out, oracle, atol=2e-6)

    # regression: ignoring the offset (old behavior) WOULD be caught —
    # the unshifted render differs everywhere that matters
    frame3 = _yuv_frame_gray_chroma(seed=9, h=h, w=w)
    ignored, _ = _render(frame3, target, RenderParams(
        upscaler="lanczos", hooks=(hook_plain,)))
    assert np.abs(out - ignored).max() > 1e-3


MAIN_IDENTITY_OFFSET = """\
//!HOOK MAIN
//!BIND HOOKED
//!OFFSET 0.5 0.0
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
"""


def test_offset_at_main_stage():
    """A non-resizing MAIN pass with an offset == crop shifted 1:1."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.render.renderer import RenderParams, Target

    h, w = 32, 48
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)
    hook = user_shader_hook(MAIN_IDENTITY_OFFSET)
    hook_plain = user_shader_hook(
        MAIN_IDENTITY_OFFSET.replace("//!OFFSET 0.5 0.0\n", ""))

    frame = _yuv_frame(seed=10, h=h, w=w)
    out, r = _render(frame, target,
                     RenderParams(upscaler="lanczos", hooks=(hook,)))
    assert not r._disabled_hooks
    frame2 = _yuv_frame(seed=10, h=h, w=w)
    frame2.crop = RectF(0.5, 0.0, w + 0.5, float(h))
    oracle, _ = _render(frame2, target, RenderParams(
        upscaler="lanczos", hooks=(hook_plain,)))
    np.testing.assert_array_equal(out, oracle)


def test_offset_align_pins_chroma_to_ref_grid():
    """//!OFFSET ALIGN on a chroma hook discards the chroma siting
    offset (reference custom_mpv.c:1544-1550 re-anchors the rect)."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import RenderParams, Target

    h, w = 32, 48
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)
    align_hook = user_shader_hook("""\
//!HOOK CHROMA
//!BIND HOOKED
//!OFFSET ALIGN
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
""")
    plain_hook = user_shader_hook("""\
//!HOOK CHROMA
//!BIND HOOKED
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
""")
    frame = _yuv_frame(seed=11, h=h, w=w)
    frame.set_chroma_location("top_left")
    out, r = _render(frame, target, RenderParams(
        upscaler="lanczos", hooks=(align_hook,)))
    assert not r._disabled_hooks

    # oracle: identical pass chain, but the frame sited dead-center
    # (zero siting offset)
    frame2 = _yuv_frame(seed=11, h=h, w=w)
    frame2.set_chroma_location("center")
    oracle, _ = _render(frame2, target, RenderParams(
        upscaler="lanczos", hooks=(plain_hook,)))
    np.testing.assert_array_equal(out, oracle)

    # and the siting offset is real: without ALIGN the render differs
    frame3 = _yuv_frame(seed=11, h=h, w=w)
    frame3.set_chroma_location("top_left")
    sited, _ = _render(frame3, target, RenderParams(
        upscaler="lanczos", hooks=(plain_hook,)))
    assert np.abs(out - sited).max() > 1e-5


def test_offset_at_unsupported_stage_auto_disables():
    """OFFSET where the renderer cannot compensate (POSTKERNEL) is a
    clean error -> auto-disable, NOT a silent misalignment."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import RenderParams, Target

    hook = user_shader_hook("""\
//!HOOK POSTKERNEL
//!BIND HOOKED
//!OFFSET -0.5 -0.5
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
""")
    h, w = 32, 48
    frame = _yuv_frame(seed=12, h=h, w=w)
    target = Target(w=2 * w, h=2 * h, color=CSP_SRGB, bit_depth=0)
    out, r = _render(frame, target, RenderParams(
        upscaler="lanczos", hooks=(hook,)))
    assert r._disabled_hooks, "OFFSET at POSTKERNEL must auto-disable"
    ref, _ = _render(_yuv_frame(seed=12, h=h, w=w), target,
                     RenderParams(upscaler="lanczos"))
    np.testing.assert_array_equal(out, ref)


def test_offset_on_save_pass_auto_disables():
    hook = user_shader_hook("""\
//!HOOK MAIN
//!BIND HOOKED
//!SAVE SOMETEX
//!OFFSET -0.5 -0.5
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}

//!HOOK MAIN
//!BIND SOMETEX
vec4 hook() {
    return SOMETEX_tex(HOOKED_pos);
}
""")
    img = _img(8, 12, seed=13)
    disabled = set()
    out = run_hooks([hook], HookStage.RGB, img, disabled)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img))
    assert hook.signature in disabled


def test_hook_rect_compose_and_rotate():
    from libplacebo_tpu.render.hooks import HookRect
    hr = HookRect()
    hr.apply_pass(2.0, 2.0, (-0.5, -0.5))       # double + offset
    hr.apply_pass(1.0, 1.0, (0.25, 0.0))        # 1:1 + offset
    assert (hr.ox, hr.oy) == (-0.25, -0.5)
    hr.apply_pass(3.0, 3.0)                      # scale-only pass
    assert (hr.ox, hr.oy) == (-0.75, -1.5)
    # align resets the accumulation and marks the plane pinned
    hr.apply_pass(1.0, 1.0, align=True)
    assert hr.align and (hr.ox, hr.oy) == (0.0, 0.0)
    # rotation: offset vector (dx, dy) -> (dy, -dx) per quarter turn
    hr2 = HookRect(ox=1.0, oy=2.0)
    hr2.rotate(1)
    assert (hr2.ox, hr2.oy) == (2.0, -1.0)
    hr2.rotate(3)
    assert (hr2.ox, hr2.oy) == (1.0, 2.0)


def test_offset_at_native_rotates_with_frame():
    """A NATIVE-stage offset precedes the renderer's rotation; the crop
    lives in rotated space, so the offset vector transforms
    (dx, dy) -> (dy, -dx) per quarter turn."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.core.common import RectF
    from libplacebo_tpu.core.common import Rotation
    from libplacebo_tpu.render.renderer import RenderParams, Target

    h, w = 32, 48
    hook = user_shader_hook("""\
//!HOOK NATIVE
//!BIND HOOKED
//!OFFSET 0.5 0.0
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
""")
    hook_plain = user_shader_hook("""\
//!HOOK NATIVE
//!BIND HOOKED
vec4 hook() {
    return HOOKED_tex(HOOKED_pos);
}
""")
    target = Target(w=2 * h, h=2 * w, color=CSP_SRGB, bit_depth=0)
    frame = _yuv_frame_gray_chroma(seed=14, h=h, w=w)
    frame.rotation = Rotation(1)
    frame.crop = RectF(0, 0, h, w)       # crop in rotated space
    out, r = _render(frame, target, RenderParams(
        upscaler="lanczos", hooks=(hook,)))
    assert not r._disabled_hooks

    # oracle: rotated-space crop shifted by rotate(1)(0.5, 0) = (0, -0.5)
    frame2 = _yuv_frame_gray_chroma(seed=14, h=h, w=w)
    frame2.rotation = Rotation(1)
    frame2.crop = RectF(0, -0.5, h, w - 0.5)
    oracle, _ = _render(frame2, target, RenderParams(
        upscaler="lanczos", hooks=(hook_plain,)))
    np.testing.assert_allclose(out, oracle, atol=2e-6)


# ---------------------------------------------------------------------------
# Cross-frame hook state: //!TEXTURE ... STORAGE images and //!BUFFER
# STORAGE vars persist across frames (reference: PL_DESC_STORAGE_IMG +
# PL_DESC_BUF_STORAGE are persistent objects on the hook,
# custom_mpv.c:444-450,529-530; SAVE'd pass textures by contrast reset
# per frame via hook_reset, custom_mpv.c:941-944 + renderer.c:3371 —
# matched exactly).
# ---------------------------------------------------------------------------

TEMPORAL_EMA_SHADER = """\
//!TEXTURE ACC
//!SIZE 48 32
//!FORMAT rgba32f
//!STORAGE

//!BUFFER st
//!STORAGE
//!VAR float frames

//!HOOK MAIN
//!BIND HOOKED
//!BIND ACC
//!DESC temporal EMA accumulator
//!COMPUTE 8 8
void hook()
{
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = HOOKED_texOff(0);
    vec4 prev = imageLoad(ACC, pos);
    vec4 ema = (frames < 0.5) ? c : (0.3 * c + 0.7 * prev);
    imageStore(ACC, pos, ema);
    imageStore(out_image, pos, ema);
}

//!HOOK MAIN
//!BIND HOOKED
//!DESC frame counter bump
vec4 hook()
{
    frames = frames + 1.0;
    return HOOKED_texOff(0);
}
"""


def _const_rgb_frame(rgb, h=32, w=48):
    from libplacebo_tpu.render.frame import frame_from_rgb
    img = np.broadcast_to(np.asarray(rgb, np.float32), (h, w, 3)).copy()
    return frame_from_rgb(img)


def test_temporal_ema_hook_across_frames():
    """A STORAGE-texture EMA + STORAGE-buffer frame counter matches a
    numpy oracle over a 4-frame sequence through the full Renderer.
    Constant-color frames make the oracle exact: the hooked render of
    frame i must equal a no-hook render of a frame whose constant value
    is the running EMA."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import Renderer, RenderParams, Target

    h, w = 32, 48
    target = Target(w=w, h=h, color=CSP_SRGB, bit_depth=0)
    hook = user_shader_hook(TEMPORAL_EMA_SHADER)
    params = RenderParams(hooks=(hook,), peak_detect=None)
    r = Renderer()

    vals = [np.array([0.8, 0.2, 0.4], np.float32),
            np.array([0.1, 0.9, 0.5], np.float32),
            np.array([0.6, 0.3, 0.7], np.float32),
            np.array([0.2, 0.5, 0.1], np.float32)]
    ema = None
    for i, v in enumerate(vals):
        out = np.asarray(r._render_once(_const_rgb_frame(v, h, w),
                                        target, params))
        assert not r._disabled_hooks, "temporal hook auto-disabled"
        ema = v if ema is None else 0.3 * v + 0.7 * ema
        oracle = np.asarray(Renderer()._render_once(
            _const_rgb_frame(ema, h, w), target,
            RenderParams(peak_detect=None)))
        np.testing.assert_allclose(out, oracle, atol=3e-6,
                                   err_msg=f"frame {i}")
    # the counter really carried: 4 frames -> frames == 4
    carried = r._hook_states[(hook.signature, "buf:frames")]
    assert float(np.asarray(carried)[0]) == 4.0


def test_temporal_state_reset():
    """Renderer.reset_hook_state() reinitializes: the next frame
    behaves like frame 0 again."""
    from libplacebo_tpu.core.colorspace import CSP_SRGB
    from libplacebo_tpu.render.renderer import Renderer, RenderParams, Target

    h, w = 32, 48
    target = Target(w=w, h=h, color=CSP_SRGB, bit_depth=0)
    hook = user_shader_hook(TEMPORAL_EMA_SHADER)
    params = RenderParams(hooks=(hook,), peak_detect=None)
    r = Renderer()
    v0 = np.array([0.8, 0.2, 0.4], np.float32)
    v1 = np.array([0.1, 0.9, 0.5], np.float32)
    first = np.asarray(r._render_once(_const_rgb_frame(v0, h, w),
                                      target, params))
    np.asarray(r._render_once(_const_rgb_frame(v1, h, w), target, params))
    r.reset_hook_state()
    again = np.asarray(r._render_once(_const_rgb_frame(v0, h, w),
                                      target, params))
    np.testing.assert_allclose(first, again, atol=1e-7)


def test_storage_texture_readback_in_second_pass():
    """A STORAGE texture written by pass 1 (fragment imageStore) is
    readable by pass 2 within the same frame (read-modify-write on the
    persistent image)."""
    sh = """\
//!TEXTURE SCRATCH
//!SIZE 12 8
//!FORMAT rgba32f
//!STORAGE

//!HOOK MAIN
//!BIND HOOKED
//!BIND SCRATCH
//!COMPUTE 8 8
void hook()
{
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    vec4 c = HOOKED_texOff(0);
    imageStore(SCRATCH, pos, c * 0.5);
    imageStore(out_image, pos, c);
}

//!HOOK MAIN
//!BIND HOOKED
//!BIND SCRATCH
//!COMPUTE 8 8
void hook()
{
    ivec2 pos = ivec2(gl_GlobalInvocationID.xy);
    imageStore(out_image, pos, imageLoad(SCRATCH, pos) * 2.0);
}
"""
    hook = user_shader_hook(sh)
    img = _img(8, 12, seed=21)
    out = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    np.testing.assert_allclose(out, np.asarray(img), atol=1e-6)


def test_storage_texture_stateless_harness_resets():
    """Without the renderer's state channel (plain run_hooks), STORAGE
    textures re-init from their declared data each frame."""
    hook = user_shader_hook(TEMPORAL_EMA_SHADER.replace("48 32", "12 8"))
    img = _img(8, 12, seed=22)
    a = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    b = np.asarray(run_hooks([hook], HookStage.RGB, img, set()))
    np.testing.assert_array_equal(a, b)
