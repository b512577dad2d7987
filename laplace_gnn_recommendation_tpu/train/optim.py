"""Row-sparse (lazy) Adam for embedding tables.

TPU-native counterpart of the reference's ``SparseAdam`` variant
(``pinsage/model_sparse.py:104-127``): only the rows an iteration actually
touched get their Adam moments decayed and applied — the torch SparseAdam
"lazy" semantics. On TPU this matters for big tables: the dense optimizer
reads+writes the full [N, D] moments every step (3·N·D·4 bytes of HBM
traffic); the sparse update scatters O(touched · D).

Touched rows are *known statically* from the batch structure (the PinSAGE
block layout puts every referenced item id in ``blocks[0].src_ids``), so no
dynamic uniquification is needed — pad slots are masked out via ``row_mask``
and dropped by the scatter.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class SparseAdamState(NamedTuple):
    m: jnp.ndarray      # [N, D] first moments (touched rows only evolve)
    v: jnp.ndarray      # [N, D] second moments
    count: jnp.ndarray  # scalar global step (torch SparseAdam semantics)


def init_sparse_adam_state(table: jnp.ndarray) -> SparseAdamState:
    return SparseAdamState(
        m=jnp.zeros_like(table),
        v=jnp.zeros_like(table),
        count=jnp.zeros((), jnp.int32),
    )


def sparse_rows_adam_update(
    table: jnp.ndarray,        # [N, D] (or [N] for 1-D bias tables)
    state: SparseAdamState,
    rows: jnp.ndarray,         # int32 [R] touched row ids (may contain pads)
    row_mask: jnp.ndarray,     # bool [R] valid-row mask
    grad_rows: jnp.ndarray,    # [R, D] (or [R]) gradient w.r.t. those rows
    lr: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> Tuple[jnp.ndarray, SparseAdamState]:
    """One lazy-Adam step on the touched rows. Returns (table, state)."""
    n = table.shape[0]
    count = state.count + 1
    safe_rows = jnp.where(row_mask, rows, n)  # OOB → dropped by scatter

    m_rows = state.m[jnp.clip(rows, 0, n - 1)]
    v_rows = state.v[jnp.clip(rows, 0, n - 1)]
    m_new = b1 * m_rows + (1 - b1) * grad_rows
    v_new = b2 * v_rows + (1 - b2) * grad_rows ** 2
    c = count.astype(table.dtype)
    m_hat = m_new / (1 - b1 ** c)
    v_hat = v_new / (1 - b2 ** c)
    delta = lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_m = state.m.at[safe_rows].set(m_new, mode="drop")
    new_v = state.v.at[safe_rows].set(v_new, mode="drop")
    new_table = table.at[safe_rows].add(-delta, mode="drop")
    return new_table, SparseAdamState(new_m, new_v, count)
