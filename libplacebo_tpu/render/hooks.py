"""User hooks: custom processing injected at fixed pipeline stages.

TPU-native rebuild of the reference's hook system
(src/include/libplacebo/shaders/custom.h:106-259, execution engine
renderer.c:1036).  The reference's hooks are GLSL shader fragments with
a BIND/SAVE resource contract; GLSL is meaningless here, so a hook is a
*Python callable* receiving the traced image and a context — it
composes into the same jit-compiled pipeline (XLA fuses it like any
other stage).  The mpv .hook text format's tunable-parameter model is
kept (Hook.parameters), its GLSL body is not.

Stage set mirrors pl_hook_stage exactly.
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

__all__ = ["HookStage", "Hook", "HookParams", "HookRect", "run_hooks"]


class HookStage(enum.Flag):
    """Reference pl_hook_stage (custom.h:106-129)."""
    RGB_INPUT = enum.auto()      # decoded RGB input planes
    LUMA_INPUT = enum.auto()     # raw luma plane
    CHROMA_INPUT = enum.auto()   # raw chroma planes
    ALPHA_INPUT = enum.auto()
    XYZ_INPUT = enum.auto()      # raw planes of an XYZ-encoded frame
    CHROMA_SCALED = enum.auto()  # chroma after merge to luma grid
    ALPHA_SCALED = enum.auto()
    NATIVE = enum.auto()         # combined plane image, pre-decode
    RGB = enum.auto()            # after color decode
    LINEAR = enum.auto()         # linear light
    SIGMOID = enum.auto()        # sigmoidized light
    PRE_KERNEL = enum.auto()     # right before the main scaler
    POST_KERNEL = enum.auto()    # right after the main scaler
    SCALED = enum.auto()         # after scaling, original color space
    PRE_OUTPUT = enum.auto()     # before target color encoding
    OUTPUT = enum.auto()         # final output, pre-dither


@dataclass
class HookRect:
    """Accumulated sampling-rect transform declared by hooks (the
    reference's pl_hook_res.rect channel: each pass updates the hooked
    texture's rect as `new = scale * old + offset`, custom_mpv.c:
    1533-1551).  The renderer owns one per compensable hook site; hook
    implementations (mpv //!OFFSET) call apply_pass per executed pass.
    The renderer consumes only the residual offset — the pure scale part
    is re-derived from the image shapes it already tracks."""
    ox: float = 0.0
    oy: float = 0.0
    align: bool = False          # //!OFFSET ALIGN: pin to the ref grid

    def apply_pass(self, scale_x: float, scale_y: float,
                   off=(0.0, 0.0), align: bool = False) -> None:
        # rect_n = s_n * rect_{n-1} + o_n  =>  acc = s * acc + o
        self.ox = self.ox * scale_x + off[0]
        self.oy = self.oy * scale_y + off[1]
        if align:
            # reference: ALIGN shifts the rect to exactly the scaled
            # src_rect — the accumulated offset is discarded and the
            # plane pins to the reference grid (custom_mpv.c:1544-1550)
            self.align = True
            self.ox = 0.0
            self.oy = 0.0

    def rotate(self, k: int) -> None:
        """Transform the accumulated offset through a rot90(k) of the
        image (NATIVE-stage offsets precede the renderer's rotation;
        the crop they shift lives in rotated space).  Under np.rot90
        with k=1 a point (x, y) maps to (y, W-1-x), so an offset
        VECTOR maps (dx, dy) -> (dy, -dx) per quarter turn."""
        for _ in range(int(k) % 4):
            self.ox, self.oy = self.oy, -self.ox


@dataclass
class HookParams:
    """What a hook sees (reference pl_hook_params, custom.h:167-259)."""
    stage: HookStage
    src_w: int = 0
    src_h: int = 0
    dst_w: int = 0
    dst_h: int = 0
    components: int = 3
    parameters: Dict[str, float] = field(default_factory=dict)
    # sampling-rect accumulator for stages where the renderer can
    # compensate declared offsets; None elsewhere (declaring an offset
    # there is then a clean error -> auto-disable)
    rect: Optional[HookRect] = None
    # persistent cross-frame hook state (SAVE textures / STORAGE
    # buffers): carried-in values keyed by (hook signature, name)
    state_in: Optional[Dict] = None
    state_out: Optional[Dict] = None
    # shexpr size overrides (name -> (h, w)): the sharded halo pipeline
    # runs hooks on LOCAL row blocks but //!WHEN conditions must see the
    # GLOBAL sizes the single-chip renderer would
    size_override: Optional[Dict] = None


@dataclass
class Hook:
    """A user hook (reference pl_hook, custom.h:300-340).

    func(img, params: HookParams) -> img. `img` is the traced (C, H, W)
    array at that stage; returning it unchanged is a no-op. Hooks that
    raise during tracing are auto-disabled (reference: misbehaving hooks
    disabled by signature, renderer.c:64-65).
    """
    stages: HookStage
    func: Callable
    name: str = ""
    # tunable parameters (the mpv PARAM model, custom_mpv.c:687)
    parameters: Dict[str, float] = field(default_factory=dict)
    signature: int = 0

    def __post_init__(self):
        if not self.signature:
            self.signature = id(self.func)


def run_hooks(hooks: Optional[List[Hook]], stage: HookStage, img,
              disabled: Optional[set] = None, states=None, **ctx):
    """Execute all enabled hooks matching `stage` in order.

    `states`: optional cross-frame hook-state channel — a dict mapping
    hook signature -> (state_in dict, state_out dict); hooks declaring
    a `state_spec` read carried values from state_in and deposit the
    next frame's values in state_out (the renderer threads these
    through the jit signature)."""
    if not hooks:
        return img
    params = HookParams(stage=stage,
                        src_h=img.shape[-2], src_w=img.shape[-1],
                        components=img.shape[-3] if img.ndim >= 3 else 1,
                        **ctx)
    for hook in hooks:
        if not (hook.stages & stage):
            continue
        if disabled is not None and hook.signature in disabled:
            continue
        params.parameters = dict(hook.parameters)
        if states is not None and hook.signature in states:
            params.state_in, params.state_out = states[hook.signature]
        else:
            params.state_in = params.state_out = None
        try:
            out = hook.func(img, params)
            if out is not None:
                img = out
        except Exception as e:
            # auto-disable misbehaving hooks instead of failing frames
            # (reference rr->disabled_hooks, renderer.c:64-65) — logged,
            # never silent
            from ..core.log import default_log
            default_log().error(
                f"hook {hook.name or hook.signature!r} failed at stage "
                f"{stage.name}: {type(e).__name__}: {e}; disabled")
            if disabled is not None:
                disabled.add(hook.signature)
    return img
