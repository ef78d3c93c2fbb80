"""Device mesh and sharding utilities."""
from .mesh import (  # noqa: F401
    get_mesh,
    make_mesh,
    replicated,
    shard_batch,
    batch_sharding,
)
