"""Vectorized binary search over CSR rows.

Replaces ``t.bucketize`` (reference ``data/dataset.py:233-241``) and the
positive-membership test inside ``structured_negative_sampling`` (PyG C++,
used at ``data/lightgcn_loader.py:105``).

The combined-key trick (``u * num_items + i``) overflows int32 at H&M scale
(1.4e11), so instead we run an explicit fixed-iteration lower-bound binary
search *within each row's CSR slice*. All lanes search in lockstep; the
iteration count is ``ceil(log2(max_row_len + 1))``, a static quantity — XLA
unrolls it into ~log2(E) gathers, no data-dependent control flow.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def lower_bound(sorted_vals: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                targets: jnp.ndarray, max_range: int) -> jnp.ndarray:
    """Per-lane ``lower_bound`` of ``targets`` in ``sorted_vals[lo:hi)``.

    Parameters are parallel arrays; returns the insertion index per lane.
    ``max_range`` bounds ``hi - lo`` and must be static.
    """
    n = int(sorted_vals.shape[0])
    iters = max(1, math.ceil(math.log2(max_range + 1)))

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        v = sorted_vals[jnp.minimum(mid, n - 1)]
        go_right = (v < targets) & (lo < hi)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where((~go_right) & (lo < hi), mid, hi)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def batched_membership(row_ptr: jnp.ndarray, sorted_cols: jnp.ndarray,
                       rows: jnp.ndarray, candidates: jnp.ndarray,
                       max_row_len: int) -> jnp.ndarray:
    """``candidates[l] ∈ CSR_row(rows[l])`` for every lane ``l`` (bool array).

    ``sorted_cols`` is the row-major-sorted column array (columns ascending
    within each row); ``row_ptr`` delimits rows. Works on any shape of
    ``rows``/``candidates`` (they broadcast together).
    """
    rows_f = rows.reshape(-1)
    cand_f = candidates.reshape(-1)
    lo = row_ptr[rows_f]
    hi = row_ptr[rows_f + 1]
    pos = lower_bound(sorted_cols, lo, hi, cand_f, max_row_len)
    n = int(sorted_cols.shape[0])
    found = (pos < hi) & (sorted_cols[jnp.minimum(pos, n - 1)] == cand_f)
    return found.reshape(jnp.broadcast_shapes(rows.shape, candidates.shape))
