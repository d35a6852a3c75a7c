"""Tier 2 — device-side image operations (JAX/XLA + Pallas).

Equivalent of the reference's shader routine library (src/shaders/*.c),
re-expressed as traceable functions over planar float32 images of shape
(C, H, W).  Where the reference generates GLSL text fragments that are
merged and compiled per pass, these functions compose in Python and XLA
fuses them; the compute-shader special cases (polar EWA, histogram
reduction, error diffusion, film grain) become Pallas kernels.
"""

from . import color  # noqa: F401
from . import deband  # noqa: F401
from . import deinterlace  # noqa: F401
from . import dithering  # noqa: F401
from . import film_grain  # noqa: F401
from . import peak_detect  # noqa: F401
from . import polar  # noqa: F401
from . import sampling  # noqa: F401
from . import tone_dynamic  # noqa: F401
