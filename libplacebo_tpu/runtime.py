"""Device/runtime context — the pl_gpu analog.

The reference's Tier 1 (src/gpu.c + vulkan/opengl/d3d11 backends)
abstracts device bring-up, capability negotiation, format tables, and
resource pools.  On TPU, XLA owns textures/buffers/pipelines, so the
context reduces to: device discovery, capability limits, mesh
construction, cache attachment, and upload placement — plus a "dummy"
CPU mode mirroring the reference's malloc-backed dummy backend
(src/dummy.c) for GPU-less testing.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .core.cache import Cache
from .core.log import Log, default_log

__all__ = ["TpuLimits", "TpuContext", "Timer", "create", "create_dummy"]


class Timer:
    """pl_timer analog (reference gpu.h:403-437): non-blocking,
    in-order completion timing.  XLA exposes no device timestamp
    queries, so a timer measures submit->ready wall latency instead of
    device ns: `start()` before dispatching, `stop(out)` with an output
    array whose readiness marks completion, and `query()` harvests
    finished measurements opportunistically — never blocking, exactly
    like the reference's pl_timer_query contract (in-order results,
    None while nothing new completed)."""

    def __init__(self):
        from collections import deque
        self._pending = deque()
        self._ready = deque()
        self._t0 = None

    def start(self):
        import time
        self._t0 = time.perf_counter()

    def stop(self, out):
        """Associate the in-flight work with `out` (a jax.Array)."""
        if self._t0 is None:
            raise RuntimeError("Timer.stop() without start()")
        self._pending.append((self._t0, out))
        self._t0 = None

    def _poll(self):
        import time
        while self._pending:
            t0, arr = self._pending[0]
            is_ready = getattr(arr, "is_ready", None)
            if is_ready is not None and not arr.is_ready():
                break
            if is_ready is None:          # non-Array: treat as done
                pass
            self._ready.append(time.perf_counter() - t0)
            self._pending.popleft()

    def query(self) -> Optional[float]:
        """Oldest completed measurement in seconds, or None."""
        self._poll()
        return self._ready.popleft() if self._ready else None


@dataclass(frozen=True)
class TpuLimits:
    """Capability limits (the pl_glsl_version/pl_gpu_limits analog,
    gpu.h:64-148)."""
    device_kind: str = ""
    num_devices: int = 1
    vmem_bytes: int = 16 * 2 ** 20      # per-core VMEM (v5e: ~16 MiB)
    hbm_bytes: int = 16 * 2 ** 30
    lane_width: int = 128               # vreg lanes
    sublane_width: int = 8              # f32 sublanes
    mxu_size: int = 128                 # systolic array dim
    supports_pallas: bool = True
    supports_collectives: bool = False  # >1 device


class TpuContext:
    """Reference pl_gpu object: owns the device list, limits, cache and
    log; hands out meshes and placements."""

    def __init__(self, devices: Optional[List] = None,
                 log: Optional[Log] = None,
                 cache: Optional[Cache] = None):
        import jax
        self._jax = jax
        self.devices = list(devices) if devices is not None \
            else jax.devices()
        self.log = log or default_log()
        self.cache = cache or Cache()
        self._failed = False
        # persistent XLA compile cache, on by default (opt out with
        # LPTPU_XLA_CACHE_DIR=0) — cold Mosaic compiles are minutes
        from .core.cache import enable_default_xla_cache
        enable_default_xla_cache()
        kind = self.devices[0].device_kind if self.devices else "cpu"
        is_tpu = "tpu" in str(kind).lower() or "TPU" in str(kind)
        self.limits = TpuLimits(
            device_kind=str(kind),
            num_devices=len(self.devices),
            supports_pallas=True,
            supports_collectives=len(self.devices) > 1,
        )
        self.log.info(
            f"TpuContext: {self.limits.num_devices} x "
            f"{self.limits.device_kind}")

    # -- reference pl_gpu_set_cache (gpu.h:255) ------------------------
    def set_cache(self, cache: Cache):
        self.cache = cache

    def set_disk_cache(self, path: str):
        """Persist compiled pipelines across processes (the reference
        caches SPIR-V/pipeline blobs through pl_cache; here the XLA
        persistent compilation cache plays that role).

        NB: like the reference's pipeline caches, entries are only
        portable between identical devices — XLA warns (and recompiles)
        on CPU-feature mismatches."""
        from .core.cache import set_xla_cache_dir
        import os
        os.makedirs(path, exist_ok=True)
        set_xla_cache_dir(path)

    # -- mesh construction (multi-chip; SURVEY §5.8) --------------------
    def make_mesh(self, data: int = 1, spatial: Optional[int] = None):
        from .parallel import make_mesh
        return make_mesh(data=data, spatial=spatial, devices=self.devices)

    # -- uploads (the pl_tex_upload / PBO path analog) -------------------
    def upload(self, array, device=None):
        import jax.numpy as jnp
        data = jnp.asarray(np.asarray(array))
        return self._jax.device_put(
            data, device or self.devices[0])

    def renderer(self):
        from .render.renderer import Renderer
        return Renderer()

    def timer(self) -> Timer:
        """Create a pl_timer analog (reference pl_timer_create)."""
        return Timer()

    @property
    def is_failed(self) -> bool:
        """Reference pl_gpu_is_failed (gpu.h:1398): a cheap FLAG, set by
        the first failed device operation (probing with a blocking
        round-trip per query would cost ~30 ms over the axon tunnel).
        Use `check_alive()` for an active probe."""
        return self._failed

    def mark_failed(self):
        """Record device loss (called by execution wrappers on XLA
        runtime errors — the analog of vk_ctx.failed)."""
        self._failed = True

    def check_alive(self) -> bool:
        """Active device probe: one tiny upload+fetch round trip
        (~30 ms over the tunnel). Sets the failed flag on error."""
        try:
            x = self.upload(np.zeros(1, np.float32))
            float(x[0])
            return True
        except Exception:
            self._failed = True
            return False


def create(log: Optional[Log] = None) -> TpuContext:
    """Bring up the default context (reference pl_vulkan_create +
    pl_gpu_create path, SURVEY §3.4)."""
    return TpuContext(log=log)


def create_dummy(log: Optional[Log] = None) -> TpuContext:
    """CPU-backed context for tests (reference src/dummy.c)."""
    import jax
    cpu = [d for d in jax.devices("cpu")] if jax.default_backend() == "cpu" \
        else jax.devices()
    try:
        cpu = jax.devices("cpu")
    except RuntimeError:
        cpu = jax.devices()
    return TpuContext(devices=list(cpu), log=log)
