"""Tier 0 — pure host-side math, GPU/TPU-independent.

Equivalent of the reference's Tier 0 (src/colorspace.c, tone_mapping.c,
gamut_mapping.c, filters.c, dither.c, cache.c, common.c, options.c).
"""

from . import colorspace  # noqa: F401
from . import common  # noqa: F401
from . import cache  # noqa: F401
from . import dither  # noqa: F401
from . import filters  # noqa: F401
from . import gamut_mapping  # noqa: F401
from . import log  # noqa: F401
from . import lut  # noqa: F401
from . import options  # noqa: F401
from . import tone_mapping  # noqa: F401
from . import transfer  # noqa: F401
