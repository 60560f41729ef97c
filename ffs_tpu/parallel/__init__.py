"""Multi-chip scaling: device meshes, sharded spotfinding, halo exchange."""

from .mesh import (  # noqa: F401
    make_mesh,
    shard_frames,
    sharded_kabsch_block_step,
    sharded_packed_pipeline,
    sharded_packed_sp_pipeline,
    sharded_rotation_compact,
    rotation_frame_pixels,
    sharded_spotfind_counts,
    halo_sharded_dispersion,
)
