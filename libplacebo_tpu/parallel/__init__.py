"""Multi-chip execution: device meshes, spatially sharded frames, halo
exchange over ICI.

The reference's only multi-device component is host-mediated multi-GPU
frame transfer (demos/multigpu-bench.c) plus Vulkan external-memory
interop (SURVEY.md §5.8).  The TPU-native replacement is first-class SPMD:
frames are sharded over a `jax.sharding.Mesh` ('data' for frame batches,
'spatial' for rows of one frame), filter footprints exchange halos via
`lax.ppermute`, and global reductions (HDR peak detection) ride `psum`
over ICI.
"""

from .mesh import make_mesh, shard_frame_batch  # noqa: F401
from .spatial import sharded_render_step  # noqa: F401
from .renderer import (build_sharded_pipeline, shard_planes,  # noqa: F401
                       sharded_render_mix, sharded_state_init)
