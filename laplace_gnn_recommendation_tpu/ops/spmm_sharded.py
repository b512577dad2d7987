"""Row-sharded segment-sum SpMM over the device mesh (shard_map).

The explicit multi-chip propagation path for graphs too large to densify
(H&M: 1.37M users × 105k items). Partitioning:

* output rows (users for the item→user direction, items for the reverse)
  are sharded over the ``model`` axis — each device owns a contiguous row
  range and the edges whose destination falls in it (the graph build already
  sorts edges by destination, so the per-device edge partitions are the
  natural contiguous slices),
* source embeddings are all-gathered over ICI once per direction, then each
  device runs its local sorted segment-sum.

Communication per step = one all-gather of the source table per direction —
O(N·D) over ICI. The alternative (all-to-all of only the frontier rows each
shard's edges reference) was analyzed and rejected for this workload shape:
with E/p edges per shard drawing uniformly-ish from N source rows, the
expected distinct-row frontier is N·(1−exp(−E/(p·N))) — at H&M scale
(30M edges, 1.37M users, p=8) that is ≈0.93·N, so all-to-all would save
<10% of the all-gather volume while adding index-shuffle complexity. The
frontier variant only wins for graphs with strong partition locality
(degree ≪ N/p), which bipartite recommendation graphs do not have.

Edge partitions are padded to equal length per shard (weight-0 pads), so
the shard_map body is shape-uniform.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.graph import BipartiteGraph
from ..parallel.mesh import MODEL_AXIS


@dataclass
class ShardedBipartiteGraph:
    """Per-shard edge partitions for both directions (jittable pytree).

    Arrays are [parts, E_shard] so that sharding the leading axis over
    ``model`` gives each device exactly its partition.
    """

    # item→user direction: edges partitioned by user-row shard
    u_edge_user: jnp.ndarray   # int32 [p, E_u] LOCAL user row (offset removed)
    u_edge_item: jnp.ndarray   # int32 [p, E_u] global item id
    u_edge_w: jnp.ndarray      # f32 [p, E_u]
    # user→item direction: edges partitioned by item-row shard
    i_edge_item: jnp.ndarray   # int32 [p, E_i] LOCAL item row
    i_edge_user: jnp.ndarray   # int32 [p, E_i] global user id
    i_edge_w: jnp.ndarray      # f32 [p, E_i]
    num_users: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_items: int = dataclasses.field(metadata=dict(static=True), default=0)
    parts: int = dataclasses.field(metadata=dict(static=True), default=1)
    # the mesh the partitions were built for (static: Mesh is hashable).
    # Carried so ``models.lightgcn.lightgcn_forward`` can dispatch on the
    # operand alone — the production ``train()`` path selects this operand
    # via ``train/lightgcn_pipeline.select_propagation``.
    mesh: Mesh = dataclasses.field(metadata=dict(static=True), default=None)

    @property
    def users_per_shard(self) -> int:
        return self.num_users // self.parts

    @property
    def items_per_shard(self) -> int:
        return self.num_items // self.parts

    @staticmethod
    def from_graph(g: BipartiteGraph, mesh: Mesh) -> "ShardedBipartiteGraph":
        parts = mesh.shape[MODEL_AXIS]
        assert g.num_users % parts == 0 and g.num_items % parts == 0, (
            "pad node counts to a multiple of the model axis "
            f"({g.num_users}, {g.num_items}) % {parts}"
        )
        ups = g.num_users // parts
        ips = g.num_items // parts
        h_eu, h_ei, h_w, h_eu_im, h_ei_im, h_w_im = g.host_arrays()

        def partition(dst, src, w, rows_per_shard):
            """Split edges (sorted by dst) into per-shard equal-length blocks."""
            shard_of = dst // rows_per_shard
            counts = np.bincount(shard_of, minlength=parts)
            e_shard = max(int(counts.max(initial=1)), 1)
            e_shard = -(-e_shard // 128) * 128
            out_dst = np.zeros((parts, e_shard), np.int32)
            out_src = np.zeros((parts, e_shard), np.int32)
            out_w = np.zeros((parts, e_shard), np.float32)
            start = 0
            for p_i in range(parts):
                n = int(counts[p_i])
                sl = slice(start, start + n)
                out_dst[p_i, :n] = dst[sl] - p_i * rows_per_shard  # local rows
                out_src[p_i, :n] = src[sl]
                out_w[p_i, :n] = w[sl]
                if n > 0:
                    # keep pad segment ids non-decreasing for the
                    # indices_are_sorted=True promise (weight 0 → no-op)
                    out_dst[p_i, n:] = out_dst[p_i, n - 1]
                start += n
            return out_dst, out_src, out_w

        # user-major ordering is sorted by user = destination of item→user
        ud, us, uw = partition(h_eu, h_ei, h_w, ups)
        # item-major ordering is sorted by item = destination of user→item
        idd, ius, iw = partition(h_ei_im, h_eu_im, h_w_im, ips)

        shard = NamedSharding(mesh, P(MODEL_AXIS))
        return ShardedBipartiteGraph(
            u_edge_user=jax.device_put(jnp.asarray(ud), shard),
            u_edge_item=jax.device_put(jnp.asarray(us), shard),
            u_edge_w=jax.device_put(jnp.asarray(uw), shard),
            i_edge_item=jax.device_put(jnp.asarray(idd), shard),
            i_edge_user=jax.device_put(jnp.asarray(ius), shard),
            i_edge_w=jax.device_put(jnp.asarray(iw), shard),
            num_users=g.num_users,
            num_items=g.num_items,
            parts=parts,
            mesh=mesh,
        )


jax.tree_util.register_dataclass(ShardedBipartiteGraph)


def propagate_sharded(
    mesh: Mesh,
    sg: ShardedBipartiteGraph,
    user_emb: jnp.ndarray,  # [U, D] row-sharded P(model)
    item_emb: jnp.ndarray,  # [I, D] row-sharded P(model)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One diffusion step; outputs row-sharded like the inputs."""
    ups, ips = sg.users_per_shard, sg.items_per_shard

    def local(uu, ui, uw, ii, iu, iw, ue, ie):
        # ue/ie are this device's row blocks [ups, D] / [ips, D]
        item_full = jax.lax.all_gather(ie, MODEL_AXIS, axis=0, tiled=True)  # [I, D]
        msgs_u = uw[0][:, None] * item_full[ui[0]]
        new_u = jax.ops.segment_sum(
            msgs_u, uu[0], num_segments=ups, indices_are_sorted=True
        )
        user_full = jax.lax.all_gather(ue, MODEL_AXIS, axis=0, tiled=True)  # [U, D]
        msgs_i = iw[0][:, None] * user_full[iu[0]]
        new_i = jax.ops.segment_sum(
            msgs_i, ii[0], num_segments=ips, indices_are_sorted=True
        )
        return new_u, new_i

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(
            P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS),
            P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS),
            P(MODEL_AXIS, None), P(MODEL_AXIS, None),
        ),
        out_specs=(P(MODEL_AXIS, None), P(MODEL_AXIS, None)),
        check_vma=False,
    )
    return fn(
        sg.u_edge_user, sg.u_edge_item, sg.u_edge_w,
        sg.i_edge_item, sg.i_edge_user, sg.i_edge_w,
        user_emb, item_emb,
    )


def lightgcn_propagate_sharded(
    mesh: Mesh,
    sg: ShardedBipartiteGraph,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-iteration multi-scale mean on the sharded path (same contract as
    ``spmm.lightgcn_propagate``)."""
    acc_u, acc_i = user_emb0, item_emb0
    eu, ei = user_emb0, item_emb0
    for _ in range(num_iterations):
        eu, ei = propagate_sharded(mesh, sg, eu, ei)
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (num_iterations + 1)
    return acc_u * scale, acc_i * scale
