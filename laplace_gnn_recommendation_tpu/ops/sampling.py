"""Device-side negative sampling with positive rejection.

Replaces PyG's C++ ``structured_negative_sampling`` (reference call sites
``data/lightgcn_loader.py:105``, ``run_pipeline_lightgcn.py:40-44``) with a
fixed-shape ``jax.random`` kernel: draw T candidate rounds per edge, reject
candidates that are positives of the edge's user (CSR binary search, see
``ops/search.py``), keep the first surviving candidate. T=8 rounds drive the
residual collision probability below 1e-6 for realistic densities (density
p ⇒ p^T); any lane with all rounds positive keeps its last draw, matching
the reference's best-effort semantics (PyG retries 3 times then gives up).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .search import batched_membership


def uniform_negative_sampling(
    key: jax.Array, shape: Tuple[int, ...], num_items: int
) -> jnp.ndarray:
    """Uniform item draws with no rejection — the fast path the reference
    sampler takes when the graph/negative ratio exceeds 100
    (``data/dataset.py:200-209``)."""
    return jax.random.randint(key, shape, 0, num_items, dtype=jnp.int32)


@partial(jax.jit, static_argnames=("num_items", "max_degree", "num_tries"))
def structured_negative_sampling(
    key: jax.Array,
    edge_user: jnp.ndarray,     # int32 [E] users of the sampled edges
    user_row_ptr: jnp.ndarray,  # int32/int64 [U+1] CSR over *positive* items
    sorted_item_cols: jnp.ndarray,  # int32 [E_all] user-major sorted item ids
    num_items: int,
    max_degree: int,
    num_tries: int = 8,
) -> jnp.ndarray:
    """For each edge with user u, sample j ~ Uniform(items) s.t. (u, j) ∉ E.

    Returns int32 [E] negative item ids.
    """
    e = edge_user.shape[0]
    cands = jax.random.randint(
        key, (e, num_tries), 0, num_items, dtype=jnp.int32
    )
    is_pos = batched_membership(
        user_row_ptr,
        sorted_item_cols,
        jnp.broadcast_to(edge_user[:, None], (e, num_tries)),
        cands,
        max_row_len=max_degree,
    )  # [E, T]
    ok = ~is_pos
    # index of first non-positive round; if none, argmax gives 0 — then fall
    # back to the last round's draw (best-effort).
    first_ok = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    pick = jnp.where(any_ok, first_ok, num_tries - 1)
    return jnp.take_along_axis(cands, pick[:, None], axis=-1)[:, 0]


def sample_bpr_batch(
    key: jax.Array,
    edge_user: jnp.ndarray,
    edge_item: jnp.ndarray,
    num_edges: int,
    batch_size: int,
    user_row_ptr: jnp.ndarray,
    sorted_item_cols: jnp.ndarray,
    num_items: int,
    max_degree: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random (user, pos_item, neg_item) triples for BPR.

    Mirrors ``sample_mini_batch`` (``data/lightgcn_loader.py:95-112``):
    uniformly choose ``batch_size`` edges with replacement, then a rejected
    negative per chosen edge.
    """
    k_edges, k_neg = jax.random.split(key)
    idx = jax.random.randint(k_edges, (batch_size,), 0, num_edges, dtype=jnp.int32)
    u = edge_user[idx]
    pos = edge_item[idx]
    neg = structured_negative_sampling(
        k_neg, u, user_row_ptr, sorted_item_cols, num_items, max_degree
    )
    return u, pos, neg
