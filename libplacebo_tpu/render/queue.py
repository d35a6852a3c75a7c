"""PTS-ordered frame queue decoupling decode from vsync.

TPU-native rebuild of the reference's pl_queue
(src/utils/frame_queue.c, src/include/libplacebo/utils/frame_queue.h):
pluggable frame sources, FPS/vsync-rate estimation from timestamp
deltas, and four emission modes (PT / NEAREST / OVERSAMPLE /
INTERPOLATE) producing FrameMix windows for motion interpolation.

Threaded prefetch is replaced by Python-side lookahead through the
`get_frame` callback: JAX's async dispatch already overlaps upload and
render, so the queue only needs to stay ahead in *decode* order.
"""
from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Tuple

from .frame import Frame

__all__ = ["QueueStatus", "QueueMode", "QueueParams", "FrameMix",
           "FrameQueue"]


class QueueStatus(enum.Enum):
    OK = "ok"          # new frame emitted
    EOF = "eof"        # no more frames
    MORE = "more"      # out of frames; caller should add more and retry
    ERR = "error"


class QueueMode(enum.Enum):
    """Emission modes (frame_queue.h:40-72)."""
    POINT = "point"            # closest frame at or before pts
    NEAREST = "nearest"        # closest frame overall
    OVERSAMPLE = "oversample"  # two nearest + relative weights
    INTERPOLATE = "interpolate"  # full mixing window for a frame mixer


@dataclass
class QueueParams:
    """Reference pl_queue_params (frame_queue.h:135-185)."""
    pts: float = 0.0
    radius: float = 0.0          # mixing window radius (in vsyncs)
    vsync_duration: float = 0.0  # 0 = estimate
    frame_duration: float = 0.0  # 0 = estimate
    interpolation_threshold: float = 0.01
    # PTS drift/jitter compensation (reference frame_queue.h:148-157):
    # a requested pts this close to a queued frame's pts snaps to it,
    # and the mismatch is subtracted from all future updates until the
    # queue resets or the pts jumps discontinuously
    drift_compensation: float = 1e-3
    get_frame: Optional[Callable[[], Optional[Frame]]] = None


@dataclass
class FrameMix:
    """Reference pl_frame_mix (renderer.h:754-816): frames with signed
    timestamps relative to the target pts, in vsync units."""
    frames: List[Frame] = field(default_factory=list)
    timestamps: List[float] = field(default_factory=list)
    vsync_duration: float = 1.0


def frame_mix_radius(params) -> float:
    """Effective frame-mixing radius of a RenderParams, in vsyncs
    (reference pl_frame_mix_radius, renderer.h:822): 0 when mixing is
    disabled, else the mixer kernel's radius."""
    name = getattr(params, "frame_mixer", None)
    if not name or name in ("none", "oversample"):
        # oversample has no kernel footprint (radius 0 semantics)
        return 0.0
    from ..core import filters as flt
    cfg = flt.find_filter_config(name)
    if cfg is None:
        return 0.0
    return float(cfg.radius_bound())


def frame_mix_current(mix: "FrameMix") -> Optional[Frame]:
    """Closest frame to the current PTS by zero-order-hold semantics:
    the last frame with timestamp <= 0, or None (reference
    pl_frame_mix_current, renderer.c:3477)."""
    cur = None
    for frame, ts in zip(mix.frames, mix.timestamps):
        if ts > 0.0:
            break
        cur = frame
    return cur


def frame_mix_nearest(mix: "FrameMix") -> Optional[Frame]:
    """Closest frame to the current PTS by nearest-neighbour semantics
    (reference pl_frame_mix_nearest, renderer.c:3489)."""
    if not mix.frames:
        return None
    best, best_dist = mix.frames[0], abs(mix.timestamps[0])
    for frame, ts in zip(mix.frames[1:], mix.timestamps[1:]):
        if abs(ts) < best_dist:
            best, best_dist = frame, abs(ts)
        else:
            break
    return best


class _RatePool:
    """Windowed rate estimator (reference struct pool + update_estimate,
    frame_queue.c:54-70,247-274): rolling mean over up to 32 deltas; the
    pool RESETS when a new delta deviates >30% from the running mean
    (rate change / seek), and the estimate only updates once 4 samples
    agree — so a single jittery pts can no longer flip emission modes."""
    MAX_SAMPLES = 32
    MIN_SAMPLES = 4
    MAX_DELTA = 0.3

    def __init__(self):
        self.samples: List[float] = []
        self.total = 0
        self.estimate = 0.0

    def default(self, val: float):
        """Seed the estimate from a metadata hint (reference
        default_estimate, frame_queue.c:246): used until real samples
        take over."""
        if not self.estimate and val and val > 0:
            self.estimate = val

    def update(self, cur: float):
        if cur <= 0:
            return
        if self.samples:
            mean = sum(self.samples) / len(self.samples)
            if abs(cur - mean) / max(min(cur, mean), 1e-12) > self.MAX_DELTA:
                self.samples.clear()
        self.samples.append(cur)
        if len(self.samples) > self.MAX_SAMPLES:
            self.samples.pop(0)
        self.total += 1
        if self.total < self.MIN_SAMPLES or \
                len(self.samples) >= self.MIN_SAMPLES:
            self.estimate = sum(self.samples) / len(self.samples)

    @property
    def rate(self) -> float:
        return 1.0 / self.estimate if self.estimate > 0 else 0.0


class FrameQueue:
    """Reference pl_queue object."""

    # interpolation-threshold stickiness (frame_queue.c:58-60): once
    # interpolation is disabled because source and vsync rates match,
    # it stays disabled until the ratio exceeds the threshold for this
    # many consecutive updates
    THRESHOLD_FRAMES = 5

    def __init__(self, params: Optional[QueueParams] = None):
        self.params = params or QueueParams()
        self._frames: List[Frame] = []        # sorted by pts
        self._eof = False
        self._prev_pts = None
        self._fps_pool = _RatePool()
        self._vps_pool = _RatePool()
        self._last_vsync_pts = None
        self._threshold_stick = 0
        self._pts_offset = 0.0

    def pts_offset(self) -> float:
        """Current PTS drift-compensation offset (reference
        pl_queue_pts_offset, frame_queue.c:1079): added to every
        incoming QueueParams.pts."""
        return self._pts_offset

    @property
    def _fps_est(self) -> float:
        return self._fps_pool.rate

    @property
    def _vps_est(self) -> float:
        return self._vps_pool.rate

    # -- ingestion ----------------------------------------------------

    def push(self, frame: Optional[Frame]):
        """Add a frame (None signals EOF); reference pl_queue_push."""
        if frame is None:
            self._eof = True
            return
        self._frames.append(frame)
        self._frames.sort(key=lambda f: f.pts)
        # FPS estimation from successive pts deltas (frame_queue.c:247)
        if self._prev_pts is not None and frame.pts > self._prev_pts:
            self._fps_pool.update(frame.pts - self._prev_pts)
        if self._prev_pts is None or frame.pts > self._prev_pts:
            self._prev_pts = frame.pts

    # Reference PREFETCH_FRAMES (frame_queue.c:62): frames pulled beyond
    # the emission window so their decode + device upload (jax
    # dispatches device_put asynchronously) overlap the current frame's
    # render instead of stalling the next update().
    PREFETCH_FRAMES = 2

    def _fill_until(self, pts: float):
        if self.params.get_frame is None:
            return
        while not self._eof and (not self._frames or
                                 self._frames[-1].pts <= pts):
            f = self.params.get_frame()
            if f is None:
                self._eof = True
                break
            self.push(f)
        # prefetch ahead of the window
        extra = sum(1 for fr in self._frames if fr.pts > pts)
        while not self._eof and extra < self.PREFETCH_FRAMES:
            f = self.params.get_frame()
            if f is None:
                self._eof = True
                break
            self.push(f)
            extra += 1

    # -- introspection (reference pl_queue_estimate_fps/vps) ----------

    def estimate_fps(self) -> float:
        return self._fps_est

    def estimate_vps(self) -> float:
        return self._vps_est

    @property
    def num_frames(self) -> int:
        return len(self._frames)

    def peek(self, idx: int) -> Optional[Frame]:
        return self._frames[idx] if 0 <= idx < len(self._frames) else None

    def reset(self):
        self._frames.clear()
        self._eof = False
        self._prev_pts = None
        self._last_vsync_pts = None
        self._fps_pool = _RatePool()
        self._vps_pool = _RatePool()
        self._threshold_stick = 0
        self._pts_offset = 0.0

    # -- emission -----------------------------------------------------

    def update(self, params: Optional[QueueParams] = None,
               mode: QueueMode = QueueMode.INTERPOLATE,
               ) -> Tuple[QueueStatus, Optional[FrameMix]]:
        """Emit the frame mix for the requested pts
        (reference pl_queue_update, frame_queue.c:965)."""
        if params is not None:
            if params.get_frame is None:
                params.get_frame = self.params.get_frame
            self.params = params
        p = self.params
        pts = p.pts

        # windowed vsync rate estimation from successive update() calls,
        # seeded from the declared vsync duration until samples arrive
        if p.vsync_duration:
            self._vps_pool.default(p.vsync_duration)
        if p.frame_duration:
            self._fps_pool.default(p.frame_duration)
        if self._last_vsync_pts is not None and pts > self._last_vsync_pts:
            delta = pts - self._last_vsync_pts
            if delta > 1.0:
                # discontinuous jump (e.g. resume after suspend):
                # don't poison the vsync estimate, drop the drift
                # offset (reference frame_queue.c:990-997)
                self._pts_offset = 0.0
            else:
                self._vps_pool.update(delta)
        self._last_vsync_pts = pts

        # PTS drift compensation (reference frame_queue.c:1007-1021):
        # snap to a queued frame's pts when within the tolerance and
        # remember the offset for future updates
        if p.drift_compensation > 0.0:
            adj = pts + self._pts_offset
            for f in self._frames:
                if abs(f.pts - adj) < p.drift_compensation:
                    self._pts_offset = f.pts - pts
                    adj = f.pts
                    break
            pts = adj

        self._fill_until(pts + max(p.radius, 1.0) *
                         (p.vsync_duration or 1.0 / max(self._vps_est, 1e-9)
                          if self._vps_est else 1.0))

        if not self._frames:
            return (QueueStatus.EOF if self._eof else QueueStatus.MORE), None

        # drop frames too old to matter (keep one before the window)
        vsync = p.vsync_duration or (
            1.0 / self._vps_est if self._vps_est else
            (1.0 / self._fps_est if self._fps_est else 1.0 / 60.0))
        window = max(p.radius, 1.0) * vsync
        while len(self._frames) > 1 and \
                self._frames[1].pts <= pts - window:
            self._frames.pop(0)

        frame_dur = p.frame_duration or (
            1.0 / self._fps_est if self._fps_est else vsync)

        # source exhausted and playback has moved past the last frame's
        # display window: report EOF instead of holding the final frame
        # forever (reference pl_queue_update's eof return,
        # frame_queue.c:1009-1032)
        if self._eof and pts > self._frames[-1].pts + frame_dur:
            return QueueStatus.EOF, None

        # interpolation pointless when rates are close (reference
        # interpolation_threshold logic + stickiness, frame_queue.c:58)
        if mode == QueueMode.INTERPOLATE and self._fps_est and \
                self._vps_est:
            close = abs(self._fps_est / self._vps_est - 1.0) \
                < p.interpolation_threshold
            if close:
                self._threshold_stick = self.THRESHOLD_FRAMES
            elif self._threshold_stick > 0:
                self._threshold_stick -= 1
            if close or self._threshold_stick > 0:
                mode = QueueMode.POINT

        if mode in (QueueMode.POINT, QueueMode.NEAREST):
            if mode == QueueMode.POINT:
                cands = [f for f in self._frames if f.pts <= pts] \
                    or self._frames[:1]
                best = cands[-1]
            else:
                best = min(self._frames, key=lambda f: abs(f.pts - pts))
            mix = FrameMix([best], [(best.pts - pts) / vsync], 1.0)
            return QueueStatus.OK, mix

        if mode == QueueMode.OVERSAMPLE:
            before = [f for f in self._frames if f.pts <= pts]
            after = [f for f in self._frames if f.pts > pts]
            frames = ([before[-1]] if before else []) + \
                (after[:1] if after else [])
            if not frames:
                frames = self._frames[:1]
            mix = FrameMix(frames, [(f.pts - pts) / vsync for f in frames],
                           1.0)
            return QueueStatus.OK, mix

        # INTERPOLATE: all frames within radius*vsync of pts (plus one
        # on each side for kernel support)
        rad = max(p.radius, 1.0) * vsync
        inside = [f for f in self._frames if abs(f.pts - pts) <= rad]
        if not inside:
            before = [f for f in self._frames if f.pts <= pts]
            inside = [before[-1]] if before else self._frames[:1]
        # pad with one neighbor each side (identity search: Frame holds
        # arrays, so == comparison is not usable)
        ids = [id(f) for f in self._frames]
        idx0 = ids.index(id(inside[0]))
        idx1 = ids.index(id(inside[-1]))
        if idx0 > 0:
            inside.insert(0, self._frames[idx0 - 1])
        if idx1 + 1 < len(self._frames):
            inside.append(self._frames[idx1 + 1])
        mix = FrameMix(inside, [(f.pts - pts) / vsync for f in inside],
                       frame_dur / vsync)
        return QueueStatus.OK, mix
