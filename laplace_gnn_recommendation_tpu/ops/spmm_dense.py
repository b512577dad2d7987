"""Dense-adjacency LightGCN propagation — the MXU fast path.

TPU-first design decision (measured on TPU v5e lite, MovieLens-1M scale,
D=32): the gather + sorted-segment-sum SpMM runs at ~12 GB/s effective
(random scatter + 32-of-128 lane utilization), while the same diffusion as a
dense bf16 adjacency matmul with a pre-materialized transpose runs both
directions in 0.69 ms vs 19.3 ms — ~28×. At ML-1M scale the normalized
adjacency is 6040×3706 (44 MB bf16): tiny next to HBM. So whenever

    2 · num_users · num_items · 2 bytes  ≤  dense_bytes_budget

we materialize Ã and Ãᵀ as bf16 dense matrices once at graph build and run
the K-hop diffusion as MXU matmuls (f32 accumulation via
``preferred_element_type``). Larger graphs (H&M: 1.37M × 105k would be 288 GB)
keep the segment-sum path of :mod:`.spmm`, row-sharded over the mesh.

Numerics: bf16 adjacency entries are exact to ~3 decimal digits; the f32
accumulation keeps the diffusion well within the run-to-run variance band
(verified against the f32 segment-sum path in tests to ~1e-2 relative).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import BipartiteGraph

DENSE_BYTES_BUDGET_DEFAULT = 4 << 30  # 4 GiB for A + Aᵀ


@dataclass
class DenseAdjacency:
    """Ã and Ãᵀ as dense bf16 (jittable pytree)."""

    a: jnp.ndarray    # bf16 [U, I] symmetric-normalized adjacency
    a_t: jnp.ndarray  # bf16 [I, U] its transpose, materialized
    num_users: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_items: int = dataclasses.field(metadata=dict(static=True), default=0)

    @staticmethod
    def from_graph(g: BipartiteGraph) -> "DenseAdjacency":
        u, i, w, *_ = g.host_arrays()
        a = np.zeros((g.num_users, g.num_items), np.float32)
        # accumulate (not assign): duplicate (user, item) edges must weigh
        # the same as in the segment-sum/blocked paths
        np.add.at(a, (u, i), w)
        return DenseAdjacency(
            a=jnp.asarray(a, jnp.bfloat16),
            a_t=jnp.asarray(a.T.copy(), jnp.bfloat16),
            num_users=g.num_users,
            num_items=g.num_items,
        )


jax.tree_util.register_dataclass(DenseAdjacency)


def dense_fits(num_users: int, num_items: int,
               budget: int = DENSE_BYTES_BUDGET_DEFAULT) -> bool:
    return 2 * num_users * num_items * 2 <= budget


def propagate_dense(
    d: DenseAdjacency, user_emb: jnp.ndarray, item_emb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One diffusion step on the MXU: (Ã·E_i, Ãᵀ·E_u)."""
    new_user = jnp.dot(
        d.a, item_emb.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    new_item = jnp.dot(
        d.a_t, user_emb.astype(jnp.bfloat16), preferred_element_type=jnp.float32
    )
    return new_user, new_item


def lightgcn_propagate_dense(
    d: DenseAdjacency,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-iteration multi-scale mean, dense path (same contract as
    ``spmm.lightgcn_propagate``). Whole-loop self-adjoint VJP: the bf16
    (Ã, Ãᵀ) pair is exactly mutually transposed (elementwise rounding
    commutes with transposition), so backward = this loop on cotangents."""
    from .multiscale import self_adjoint_multiscale

    return self_adjoint_multiscale(
        propagate_dense, d, user_emb0, item_emb0, num_iterations
    )
