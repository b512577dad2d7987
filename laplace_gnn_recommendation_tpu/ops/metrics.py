"""Batched, device-side ranking metrics: recall/precision/NDCG/MAP @k.

Replaces the reference's per-user Python loops (``utils/metrics.py:6-57``,
``utils/metrics_lightgcn.py:79-142``, ``utils/metrics_encoder_decoder.py:
29-86``) with fully vectorized static-shape kernels. Ragged per-user ground
truth arrives as a padded [B, G] matrix + count vector — the ragged→dense
bridge that ``padded_stack`` (``utils/tensor.py:24-61``) performed on CPU.

Semantics preserved exactly:
* recall@k   = mean_u(hits_u / |gt_u|)                (``utils/metrics.py:20-25``)
* precision@k= mean_u(hits_u) / k                     (``utils/metrics.py:26``)
* NDCG@k     = mean_u(DCG_u / IDCG_u), IDCG over min(|gt_u|, k) ideal slots,
               0/0 → 0                                (``utils/metrics.py:43-57``)
* MAP@k      = Kaggle MAP@12 as in the submission format (``run_submission.py``)

Users with empty ground truth are excluded via ``user_mask`` (the reference
only iterates users present in the eval split, ``utils/metrics_lightgcn.py:99``).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def topk_hits(
    topk_items: jnp.ndarray,  # int32 [B, k]
    gt_items: jnp.ndarray,    # int32 [B, G] padded
    gt_count: jnp.ndarray,    # int32 [B]
) -> jnp.ndarray:
    """Boolean hit matrix r[b, j] = topk_items[b, j] ∈ gt_items[b, :gt_count[b]].

    The batched equivalent of ``t.isin`` per user
    (``utils/metrics_lightgcn.py:112-117``).
    """
    gt_mask = (
        jnp.arange(gt_items.shape[1])[None, :] < gt_count[:, None]
    )  # [B, G]
    eq = topk_items[:, :, None] == gt_items[:, None, :]  # [B, k, G]
    return jnp.any(eq & gt_mask[:, None, :], axis=-1)


def recall_precision_at_k(
    r: jnp.ndarray,          # bool [B, k] hit matrix
    gt_count: jnp.ndarray,   # int32 [B]
    k: int,
    user_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RecallPrecision_ATk (``utils/metrics.py:6-27``), masked and batched."""
    if user_mask is None:
        user_mask = gt_count > 0
    denom = jnp.maximum(jnp.sum(user_mask), 1)
    hits = jnp.sum(r, axis=-1).astype(jnp.float32)
    recall_per_user = hits / jnp.maximum(gt_count.astype(jnp.float32), 1.0)
    recall = jnp.sum(jnp.where(user_mask, recall_per_user, 0.0)) / denom
    precision = jnp.sum(jnp.where(user_mask, hits, 0.0)) / denom / k
    return recall, precision


def ndcg_at_k(
    r: jnp.ndarray,
    gt_count: jnp.ndarray,
    k: int,
    user_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """NDCGatK_r (``utils/metrics.py:31-57``), masked and batched."""
    if user_mask is None:
        user_mask = gt_count > 0
    denom = jnp.maximum(jnp.sum(user_mask), 1)
    discounts = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=jnp.float32))  # [k]
    dcg = jnp.sum(r.astype(jnp.float32) * discounts[None, :], axis=-1)
    ideal_len = jnp.minimum(gt_count, k)  # test_matrix row of leading ones
    ideal_mask = jnp.arange(k)[None, :] < ideal_len[:, None]
    idcg = jnp.sum(ideal_mask.astype(jnp.float32) * discounts[None, :], axis=-1)
    ndcg = dcg / jnp.where(idcg == 0.0, 1.0, idcg)
    return jnp.sum(jnp.where(user_mask, ndcg, 0.0)) / denom


def map_at_k(
    r: jnp.ndarray,
    gt_count: jnp.ndarray,
    k: int,
    user_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Mean Average Precision @k — the Kaggle H&M leaderboard metric behind
    the submission writer (``run_submission.py:72-75``)."""
    if user_mask is None:
        user_mask = gt_count > 0
    denom = jnp.maximum(jnp.sum(user_mask), 1)
    rf = r.astype(jnp.float32)
    cum_hits = jnp.cumsum(rf, axis=-1)
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]
    prec_at_i = cum_hits / ranks
    ap = jnp.sum(prec_at_i * rf, axis=-1) / jnp.maximum(
        jnp.minimum(gt_count, k).astype(jnp.float32), 1.0
    )
    return jnp.sum(jnp.where(user_mask, ap, 0.0)) / denom


def ranking_metrics(
    topk_items: jnp.ndarray,
    gt_items: jnp.ndarray,
    gt_count: jnp.ndarray,
    k: int,
    user_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Convenience wrapper: (recall, precision, ndcg) — the tuple returned by
    ``get_metrics_lightgcn`` (``utils/metrics_lightgcn.py:79-122``)."""
    r = topk_hits(topk_items, gt_items, gt_count)
    recall, precision = recall_precision_at_k(r, gt_count, k, user_mask)
    ndcg = ndcg_at_k(r, gt_count, k, user_mask)
    return recall, precision, ndcg
