"""Blocked one-hot-matmul segment-sum — the fast sparse SpMM for big graphs.

``jax.ops.segment_sum`` lowers to a serialized scatter-add that measures
~12 GB/s effective on v5e-lite (SURVEY's core perf deliverable is exactly
this gather/scatter SpMM). This module reformulates the sorted-segment sum
so the reduction itself runs on the MXU:

1. **Host-side plan** (once per graph): walk the destination-sorted edges
   greedily, packing chunks of ≤ ``edges_per_chunk`` edges that touch
   ≤ ``rows_per_chunk`` distinct destination rows; pad each chunk (zero
   weight). Power-law graphs pack tightly in their high-degree regions and
   pay padding only in the degree-1 tail.
2. **Device**: messages are gathered in padded [C, E_c] layout; each chunk's
   one-hot row matrix (built from the precomputed local row ids with one
   broadcasted-iota compare) contracts against its messages on the MXU:
   ``partials[C, R_c, D] = onehot[C, R_c, E_c] @ msgs[C, E_c, D]``.
3. The residual scatter adds only ``C·R_c`` partial rows — a
   ``edges_per_chunk/rows_per_chunk``-fold reduction in scatter traffic.

Used by ``propagate_blocked`` as a drop-in for the two diffusion directions
of ``ops/spmm.propagate_bipartite``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import BipartiteGraph


@dataclass
class BlockedSegmentPlan:
    """Padded chunk layout for one (sorted-destination) edge direction."""

    src: jnp.ndarray        # int32 [C, E_c] gather ids (pad → 0)
    w: jnp.ndarray          # f32 [C, E_c] weights (pad → 0)
    local_row: jnp.ndarray  # int32 [C, E_c] dst row − chunk base (pad → 0)
    row_ids: jnp.ndarray    # int32 [C, R_c] global dst row per partial slot
    num_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    edges_per_chunk: int = dataclasses.field(metadata=dict(static=True), default=128)
    rows_per_chunk: int = dataclasses.field(metadata=dict(static=True), default=8)

    @staticmethod
    def from_edges(
        dst_sorted: np.ndarray,
        src: np.ndarray,
        w: np.ndarray,
        num_rows: int,
        edges_per_chunk: int = 128,
        rows_per_chunk: int = 8,
    ) -> "BlockedSegmentPlan":
        dst_sorted = np.asarray(dst_sorted)
        src = np.asarray(src)
        w = np.asarray(w)
        e = len(dst_sorted)
        # greedy chunking: cut when edge budget or distinct-row budget hits
        cuts = [0]
        row_start = 0
        while row_start < e:
            base_row = dst_sorted[row_start]
            end = min(row_start + edges_per_chunk, e)
            # rows_per_chunk distinct rows max: find first edge whose row
            # id exceeds base + (rows budget via searchsorted on row values)
            max_row = None
            # distinct rows within [row_start, end)
            seg = dst_sorted[row_start:end]
            uniq = np.unique(seg)
            if len(uniq) > rows_per_chunk:
                limit_row = uniq[rows_per_chunk - 1]
                end = row_start + int(np.searchsorted(seg, limit_row, side="right"))
            cuts.append(end)
            row_start = end
        c = len(cuts) - 1
        e_c, r_c = edges_per_chunk, rows_per_chunk
        p_src = np.zeros((c, e_c), np.int32)
        p_w = np.zeros((c, e_c), np.float32)
        p_local = np.zeros((c, e_c), np.int32)
        p_rows = np.full((c, r_c), num_rows, np.int32)  # pad → OOB (dropped)
        for ci in range(c):
            s, t = cuts[ci], cuts[ci + 1]
            n = t - s
            rows = dst_sorted[s:t]
            uniq, local = np.unique(rows, return_inverse=True)
            p_src[ci, :n] = src[s:t]
            p_w[ci, :n] = w[s:t]
            p_local[ci, :n] = local
            p_rows[ci, : len(uniq)] = uniq
        return BlockedSegmentPlan(
            src=jnp.asarray(p_src),
            w=jnp.asarray(p_w),
            local_row=jnp.asarray(p_local),
            row_ids=jnp.asarray(p_rows),
            num_rows=num_rows,
            edges_per_chunk=e_c,
            rows_per_chunk=r_c,
        )


jax.tree_util.register_dataclass(BlockedSegmentPlan)


def blocked_segment_sum(
    plan: BlockedSegmentPlan,
    table: jnp.ndarray,
    precision="highest",
) -> jnp.ndarray:
    """Σ_{e: dst(e)=r} w_e · table[src(e)] for every row r — [num_rows, D].

    Default precision HIGHEST keeps the sums f32-exact (measured 2.9e-7 max
    relative error vs segment_sum at ML-1M scale) at no measurable cost over
    the bf16 default (5.45 ms vs 5.38 ms) — the contraction is gather-bound,
    not MXU-bound.
    """
    msgs = plan.w[..., None] * table[plan.src]                 # [C, E_c, D]
    onehot = (
        jax.lax.broadcasted_iota(
            jnp.int32, (1, plan.rows_per_chunk, plan.edges_per_chunk), 1
        )
        == plan.local_row[:, None, :]
    ).astype(table.dtype)                                       # [C, R_c, E_c]
    partials = jax.lax.dot_general(
        onehot, msgs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )                                                           # [C, R_c, D]
    flat_rows = plan.row_ids.reshape(-1)
    out = jnp.zeros((plan.num_rows, table.shape[-1]), partials.dtype)
    return out.at[flat_rows].add(
        partials.reshape(-1, table.shape[-1]), mode="drop"
    )


@dataclass
class BlockedGraph:
    """Both diffusion directions as blocked plans."""

    to_user: BlockedSegmentPlan   # dst=user, src=item
    to_item: BlockedSegmentPlan   # dst=item, src=user

    @staticmethod
    def from_graph(
        g: BipartiteGraph, edges_per_chunk: int = 128, rows_per_chunk: int = 8
    ) -> "BlockedGraph":
        e = g.num_edges
        return BlockedGraph(
            to_user=BlockedSegmentPlan.from_edges(
                np.asarray(g.edge_user[:e]), np.asarray(g.edge_item[:e]),
                np.asarray(g.edge_w[:e]), g.num_users,
                edges_per_chunk, rows_per_chunk,
            ),
            to_item=BlockedSegmentPlan.from_edges(
                np.asarray(g.edge_item_im[:e]), np.asarray(g.edge_user_im[:e]),
                np.asarray(g.edge_w_im[:e]), g.num_items,
                edges_per_chunk, rows_per_chunk,
            ),
        )

    @staticmethod
    def from_host_edges(
        user_idx: np.ndarray,
        item_idx: np.ndarray,
        num_users: int,
        num_items: int,
        edges_per_chunk: int = 128,
        rows_per_chunk: int = 8,
    ) -> "BlockedGraph":
        """Build directly from host edge arrays (no device round trip —
        ``from_graph`` has to download the edge arrays first, which is slow
        over remote-device tunnels)."""
        user_idx = np.asarray(user_idx, np.int64)
        item_idx = np.asarray(item_idx, np.int64)
        du = np.bincount(user_idx, minlength=num_users)
        di = np.bincount(item_idx, minlength=num_items)
        w = 1.0 / np.sqrt(
            np.maximum(du[user_idx] * di[item_idx], 1.0)
        )
        um = np.lexsort((item_idx, user_idx))
        im = np.lexsort((user_idx, item_idx))
        return BlockedGraph(
            to_user=BlockedSegmentPlan.from_edges(
                user_idx[um], item_idx[um], w[um], num_users,
                edges_per_chunk, rows_per_chunk,
            ),
            to_item=BlockedSegmentPlan.from_edges(
                item_idx[im], user_idx[im], w[im], num_items,
                edges_per_chunk, rows_per_chunk,
            ),
        )


jax.tree_util.register_dataclass(BlockedGraph)


def propagate_blocked(
    bg: BlockedGraph,
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    precision="highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``spmm.propagate_bipartite`` on the blocked layout
    (measured 3.6× faster at ML-1M scale: 5.4 ms vs 19.4 ms both dirs)."""
    return (
        blocked_segment_sum(bg.to_user, item_emb, precision),
        blocked_segment_sum(bg.to_item, user_emb, precision),
    )


def lightgcn_propagate_blocked(
    bg: BlockedGraph,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-iteration multi-scale mean on the blocked layout (same contract as
    ``spmm.lightgcn_propagate``)."""
    acc_u, acc_i = user_emb0, item_emb0
    eu, ei = user_emb0, item_emb0
    for _ in range(num_iterations):
        eu, ei = propagate_blocked(bg, eu, ei)
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (num_iterations + 1)
    return acc_u * scale, acc_i * scale
