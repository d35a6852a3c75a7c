"""Hand-written Pallas TPU kernels for ops XLA handles poorly.

Current kernels:
  error_diffusion — sequential-grid wavefront scan with VMEM pending-
                    error scratch (the reference's shmem ring buffer,
                    src/shaders/dithering.c:326, done TPU-style)
"""

from .error_diffusion import error_diffusion_pallas  # noqa: F401
