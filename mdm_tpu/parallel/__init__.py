"""Device mesh and sharding utilities."""
from .mesh import (  # noqa: F401
    batch_axes,
    batch_sharding,
    get_mesh,
    make_mesh,
    make_mesh_for_batch,
    replicated,
    shard_batch,
)
