"""High-level utilities: plane upload helpers and framework interop
(reference: src/utils/upload.c, include/libplacebo/utils/libav.h)."""

from . import upload  # noqa: F401
from . import interop  # noqa: F401
