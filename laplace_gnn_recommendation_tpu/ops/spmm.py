"""Sparse-adjacency × dense-embedding products (the LightGCN hot kernel).

TPU-native replacement for ``torch_sparse.matmul`` (reference
``model/lightgcn.py:85-87``) and ``gcn_norm`` (``model/lightgcn.py:56``).

Design: the bipartite interaction graph is a padded COO edge list kept in two
sort orders (see ``data/graph.py``). Each propagation direction is then a
*sorted* segment-sum:

    new_user[u] = Σ_{e : src(e)=u}  w_e · item[dst(e)]      (user-major order)
    new_item[i] = Σ_{e : dst(e)=i}  w_e · user[src(e)]      (item-major order)

``jax.ops.segment_sum`` with ``indices_are_sorted=True`` lowers to an
efficient one-pass scatter-add on TPU; the gather feeding it is the HBM-
bandwidth-bound part. A Pallas row-blocked kernel for the same contraction
lives in ``spmm_pallas.py`` and is used when profitable; this module is the
always-correct XLA path and the numerical reference for kernel tests.

Note on reference fidelity: the reference's adjacency build
(``data/lightgcn_loader.py:39-43,65-79``) zero-bases item columns into the
user id range, which makes ``propagate`` read *user* rows for item messages
and leaves item rows empty. That is a bug relative to the LightGCN paper the
model cites (``model/lightgcn.py:12``); its eval path only ever consumes the
E⁰ tables so it goes unnoticed. We implement the paper-correct symmetric
bipartite diffusion.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..data.graph import BipartiteGraph


def propagate_bipartite(
    g: BipartiteGraph, user_emb: jnp.ndarray, item_emb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One symmetric-normalized diffusion step Ã·E over the bipartite graph.

    Returns (new_user_emb, new_item_emb). Padded edges carry weight 0 and
    point at row/col 0, so they contribute nothing.
    """
    # item → user (user-major ordering: edge_user ascending)
    msgs_u = g.edge_w[:, None] * item_emb[g.edge_item]
    new_user = jax.ops.segment_sum(
        msgs_u, g.edge_user, num_segments=g.num_users, indices_are_sorted=True
    )
    # user → item (item-major ordering: edge_item_im ascending)
    msgs_i = g.edge_w_im[:, None] * user_emb[g.edge_user_im]
    new_item = jax.ops.segment_sum(
        msgs_i, g.edge_item_im, num_segments=g.num_items, indices_are_sorted=True
    )
    return new_user, new_item


def lightgcn_propagate(
    g: BipartiteGraph,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-iteration LightGCN diffusion with multi-scale mean.

    E_final = mean(E⁰, E¹, …, E^K) with E^{k+1} = Ã E^k — reference
    ``model/lightgcn.py:58-68``. The loop is a compile-time Python loop
    (K is small and static), letting XLA fuse the scale accumulation into
    each segment-sum.
    """
    acc_u, acc_i = user_emb0, item_emb0
    eu, ei = user_emb0, item_emb0
    for _ in range(num_iterations):
        eu, ei = propagate_bipartite(g, eu, ei)
        acc_u = acc_u + eu
        acc_i = acc_i + ei
    scale = 1.0 / (num_iterations + 1)
    return acc_u * scale, acc_i * scale


def segment_mean(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Mean-aggregation helper (used by SAGE 'mean' conv aggregation,
    replacing torch_scatter mean — reference ``model/layers.py:11-24``)."""
    s = jax.ops.segment_sum(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    cnt = jax.ops.segment_sum(
        jnp.ones((data.shape[0], 1), data.dtype), segment_ids,
        num_segments=num_segments, indices_are_sorted=indices_are_sorted,
    )
    return s / jnp.maximum(cnt, 1.0)


def segment_max(
    data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
    indices_are_sorted: bool = False,
) -> jnp.ndarray:
    """Max-aggregation helper; empty segments yield 0 (matching
    torch_scatter's zero-fill for empty rows)."""
    m = jax.ops.segment_max(
        data, segment_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    # segment_max fills empty segments with -inf; normalize to 0.
    return jnp.where(jnp.isfinite(m), m, 0.0)
