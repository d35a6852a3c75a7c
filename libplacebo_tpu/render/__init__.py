"""Tier 4 — the high-level renderer (reference: src/renderer.c)."""

from .frame import Frame, Plane, Overlay  # noqa: F401
from .renderer import Renderer, RenderParams, render_image  # noqa: F401
