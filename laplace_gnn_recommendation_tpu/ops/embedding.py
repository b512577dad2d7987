"""Row-sharded embedding tables with cross-shard lookup — the central new
parallel component of the TPU build (SURVEY §2b: the reference's
``nn.Embedding`` tables are single-device; here they shard over the
``model`` mesh axis so tables larger than one chip's HBM scale out).

Lookup strategy: each shard owns a contiguous row range; for a replicated id
batch every shard gathers the ids it owns (others contribute zeros) and one
``psum`` over the ``model`` axis assembles the full [B, D] result — the
compiler lowers this to an ICI all-reduce of the activation block, the
standard embedding-exchange pattern when B·D ≪ table size. The gradient of
the same program is the scatter-add back onto the owning shard, which XLA
derives automatically.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..parallel.mesh import MODEL_AXIS


def shard_table(mesh: Mesh, table: jnp.ndarray) -> jnp.ndarray:
    """Place a [N, D] table row-sharded over the model axis (N must divide)."""
    return jax.device_put(table, NamedSharding(mesh, P(MODEL_AXIS)))


def sharded_embedding_lookup(
    mesh: Mesh, table: jnp.ndarray, ids: jnp.ndarray
) -> jnp.ndarray:
    """Gather rows ``table[ids]`` from a row-sharded table.

    ``table``: [N, D] sharded P(model); ``ids``: replicated int32 [...];
    returns replicated [..., D]. Differentiable (grad scatters back onto the
    owning shard). Works on a 1-device mesh (degenerates to a plain gather).
    """
    n, d = table.shape
    parts = mesh.shape[MODEL_AXIS]
    assert n % parts == 0, (n, parts)
    shard_rows = n // parts

    def local(table_shard, ids_rep):
        my = jax.lax.axis_index(MODEL_AXIS)
        offset = my * shard_rows
        local_ids = ids_rep - offset
        in_range = (local_ids >= 0) & (local_ids < shard_rows)
        rows = table_shard[jnp.clip(local_ids, 0, shard_rows - 1)]
        rows = jnp.where(in_range[..., None], rows, 0.0)
        return jax.lax.psum(rows, MODEL_AXIS)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(table, ids)
