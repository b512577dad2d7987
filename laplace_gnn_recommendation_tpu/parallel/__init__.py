"""Device-mesh, sharding, and collective helpers (TPU-native, no reference analogue)."""

from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    build_mesh,
    data_sharding,
    replicated,
    row_sharding,
    shard_rows_pad,
)
