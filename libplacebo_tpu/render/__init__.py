"""Tier 4 — the high-level renderer (reference: src/renderer.c)."""

from .frame import Frame, Plane, Overlay  # noqa: F401
from .renderer import Renderer, RenderParams, render_image  # noqa: F401
from .hooks import Hook, HookStage  # noqa: F401
from .queue import (FrameMix, FrameQueue, frame_mix_current,  # noqa: F401
                    frame_mix_nearest, frame_mix_radius)
from .mpv_hooks import parse_user_shader, user_shader_hook  # noqa: F401
