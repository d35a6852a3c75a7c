"""Keyed blob cache with serialization & checksums.

TPU-native rebuild of the reference's pl_cache (src/cache.c,
src/include/libplacebo/cache.h): a mutexed keyed object store with size
caps and LRU-ish eviction, plus a robust serialization format (magic +
version + per-object checksums; corrupt or stale entries are silently
dropped on load).

What gets cached here: generated filter weight LUTs, gamut 3DLUTs,
autotuned Pallas configurations, and XLA executable artifacts (alongside
JAX's own compilation cache — set via `set_xla_cache_dir`).
"""
from __future__ import annotations

import io
import os
import struct
import threading
import time
import zlib
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

__all__ = ["Cache", "CacheParams", "cache_create", "set_xla_cache_dir"]

_MAGIC = b"PLTPUCCH"
_VERSION = 1


def _checksum(data: bytes) -> int:
    return zlib.crc32(data) & 0xFFFFFFFF


@dataclass
class CacheParams:
    """Reference pl_cache_params (cache.h:32-74)."""
    max_object_size: int = 0       # 0 = unlimited
    max_total_size: int = 0
    get: Optional[Callable] = None  # external backing get(key)->bytes|None
    set: Optional[Callable] = None  # external backing set(key, bytes)


@dataclass
class _Obj:
    key: int
    data: bytes
    atime: float


class Cache:
    """Reference pl_cache object (cache.h:94-212)."""

    def __init__(self, params: Optional[CacheParams] = None):
        self.params = params or CacheParams()
        self._objs: Dict[int, _Obj] = {}
        self._lock = threading.Lock()

    # -- primitive API ------------------------------------------------

    def try_set(self, key: int, data: Optional[bytes]) -> bool:
        """Insert/replace an object; None or b'' deletes. Returns False
        if rejected (over max_object_size)."""
        with self._lock:
            if not data:
                self._objs.pop(key, None)
                return True
            if self.params.max_object_size and \
                    len(data) > self.params.max_object_size:
                return False
            self._objs[key] = _Obj(key, bytes(data), time.monotonic())
            self._evict_locked()
            if self.params.set:
                self.params.set(key, bytes(data))
            return True

    def set(self, key: int, data: Optional[bytes]):
        self.try_set(key, data)

    def get(self, key: int) -> Optional[bytes]:
        with self._lock:
            obj = self._objs.get(key)
            if obj is not None:
                obj.atime = time.monotonic()
                return obj.data
        if self.params.get:
            data = self.params.get(key)
            if data:
                self.try_set(key, data)
            return data
        return None

    def _evict_locked(self):
        if not self.params.max_total_size:
            return
        total = sum(len(o.data) for o in self._objs.values())
        if total <= self.params.max_total_size:
            return
        # LRU eviction by access time (reference evicts oldest)
        for obj in sorted(self._objs.values(), key=lambda o: o.atime):
            del self._objs[obj.key]
            total -= len(obj.data)
            if total <= self.params.max_total_size:
                break

    @property
    def num_objects(self) -> int:
        with self._lock:
            return len(self._objs)

    @property
    def total_size(self) -> int:
        with self._lock:
            return sum(len(o.data) for o in self._objs.values())

    def reset(self):
        with self._lock:
            self._objs.clear()

    def signature(self) -> int:
        """Order-independent hash (XOR of keys) of all stored objects —
        used to avoid re-saving unmodified caches (reference
        pl_cache_signature, cache.c:262)."""
        with self._lock:
            sig = 0
            for key in self._objs:
                sig ^= key & (2**64 - 1)
            return sig

    def iterate(self):
        """Yield (key, data) for every stored object (reference
        pl_cache_iterate, cache.h:212 — the callback form becomes a
        generator)."""
        with self._lock:
            items = [(o.key, o.data) for o in self._objs.values()]
        yield from items

    # -- serialization (reference cache.c:283-360) --------------------

    def save(self) -> bytes:
        """Serialize all objects: magic, version, count, then per object
        (key, size, checksum, payload)."""
        with self._lock:
            buf = io.BytesIO()
            buf.write(_MAGIC)
            buf.write(struct.pack("<II", _VERSION, len(self._objs)))
            for obj in self._objs.values():
                buf.write(struct.pack("<QQI", obj.key & (2**64 - 1),
                                      len(obj.data), _checksum(obj.data)))
                buf.write(obj.data)
            return buf.getvalue()

    def load(self, data: bytes) -> int:
        """Deserialize; returns number of objects accepted. Corrupt
        entries/trailing garbage silently dropped."""
        n_ok = 0
        try:
            buf = io.BytesIO(data)
            if buf.read(8) != _MAGIC:
                return 0
            version, count = struct.unpack("<II", buf.read(8))
            if version != _VERSION:
                return 0
            for _ in range(count):
                hdr = buf.read(20)
                if len(hdr) < 20:
                    break
                key, size, chk = struct.unpack("<QQI", hdr)
                payload = buf.read(size)
                if len(payload) < size or _checksum(payload) != chk:
                    continue
                if self.try_set(key, payload):
                    n_ok += 1
        except Exception:
            pass
        return n_ok

    # -- file helpers (reference cache.h:173-179) ---------------------

    def save_file(self, path: str):
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.save())
        os.replace(tmp, path)

    def load_file(self, path: str) -> int:
        try:
            with open(path, "rb") as f:
                return self.load(f.read())
        except OSError:
            return 0


def cache_create(params: Optional[CacheParams] = None) -> Cache:
    return Cache(params)


def _machine_key() -> str:
    """Stable per-machine key for the XLA cache path: CPU AOT entries
    are machine-feature-specific (loading another machine's entries
    makes XLA warn about SIGILL risk and recompile)."""
    import hashlib
    import platform
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += line
                    break
    except OSError:
        pass
    return hashlib.sha256(sig.encode()).hexdigest()[:12]


def set_xla_cache_dir(path: str):
    """Enable JAX's persistent compilation cache (the analog of the
    reference caching compiled SPIR-V / pipeline blobs).  The directory
    is scoped by a machine key — like the reference's pipeline caches,
    entries are only valid on matching hardware."""
    import os
    import jax
    path = os.path.join(path, _machine_key())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


_default_cache_enabled = False


def enable_default_xla_cache():
    """Enable the persistent XLA compilation cache at a default
    per-user path unless the user configured one (or opted out).

    Cold Mosaic compiles of the error-diffusion kernels run minutes on
    small hosts (ops/pallas/error_diffusion.py:26-35); making the disk
    cache opt-OUT turns that into a one-time cost per machine.  Called
    at TpuContext init.  Override the location with
    LPTPU_XLA_CACHE_DIR=<path>, disable with LPTPU_XLA_CACHE_DIR=0.
    A user-set jax_compilation_cache_dir is always respected."""
    global _default_cache_enabled
    if _default_cache_enabled:
        return
    _default_cache_enabled = True
    import os
    import jax
    env = os.environ.get("LPTPU_XLA_CACHE_DIR")
    if env == "0" or env == "":
        return
    if env is None and jax.config.jax_compilation_cache_dir:
        return                          # user already configured one
    # CPU AOT entries reload with spurious machine-feature warnings
    # (XLA pseudo-features like prefer-no-gather) and save little; the
    # cache's payoff is the minutes-long Mosaic TPU compiles.
    # LPTPU_XLA_CACHE_DIR=<path> forces it on anyway.  Detect the
    # platform WITHOUT jax.default_backend(): that would force backend
    # initialization as a construction side effect — it can hang for a
    # long time when the TPU tunnel is down and pins the platform
    # before a later jax.config.update("jax_platforms", ...) can take
    # effect (ADVICE r4).  An unset platform (auto-detect) is treated
    # optimistically as TPU: jax.config.update below is harmless either
    # way and the CPU-only downside is only a spurious warning.
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if env is None and platforms.split(",")[0].strip().lower() == "cpu":
        return
    path = env or os.path.join(
        os.environ.get("XDG_CACHE_HOME",
                       os.path.expanduser("~/.cache")),
        "libplacebo_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return                          # unwritable: stay silent, no cache
    set_xla_cache_dir(path)
