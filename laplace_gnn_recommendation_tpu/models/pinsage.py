"""PinSAGE model: feature projection, weighted SAGE convs, pair scorer.

TPU-native re-design of reference ``pinsage/layers.py:90-203`` +
``pinsage/model.py:16-33`` as functional JAX over padded
:class:`~..data.pinsage_data.PinSAGEBlock` pytrees:

* :func:`project` — per-feature linear/embedding projections summed
  (``LinearProjector``, ``layers.py:90-118``), including the learnable
  per-item id embedding the reference installs as an ``id`` feature
  (``model.py:50-51``),
* :func:`weighted_sage_conv` — n = act(Q(dropout(h_src))); visit-count-
  weighted neighbor sum ÷ clamped weight sum; z = act(W(dropout([n/ws ‖
  h_dst]))); L2-normalize with 0→1 guard (``WeightedSAGEConv``,
  ``layers.py:121-156``),
* :func:`get_repr` — projected dst + SAGE stack output (``model.py:30-33``),
* :func:`score_pairs` — u·v + per-item biases (``ItemToItemScorer``,
  ``layers.py:181-203``),
* :func:`margin_loss` — mean((neg − pos + 1)₊) (``model.py:24-28``).
"""
from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pinsage_data import PinSAGEBatch, PinSAGEBlock


def _xavier(key, shape, gain=1.0):
    fan_in, fan_out = shape[0], shape[1]
    bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound)


def init_pinsage_params(
    key: jax.Array,
    num_items: int,
    feature_cardinalities: List[int],
    hidden_dims: int,
    n_layers: int,
    float_feature_dim: int = 0,
) -> dict:
    """Parameter pytree. ``feature_cardinalities[i]`` is max category id of
    categorical item-feature column i (table size +2 for the padding slot,
    matching ``layers.py:35``)."""
    keys = iter(jax.random.split(key, 64 + 2 * len(feature_cardinalities)))
    params: dict = {"proj": {"tables": [], "id_table": None}, "convs": [], "bias": None}
    for c in feature_cardinalities:
        params["proj"]["tables"].append(_xavier(next(keys), (c + 2, hidden_dims)))
    params["proj"]["id_table"] = _xavier(next(keys), (num_items, hidden_dims))
    if float_feature_dim:
        params["proj"]["float_lin"] = {
            "w": _xavier(next(keys), (float_feature_dim, hidden_dims)),
            "b": jnp.zeros((hidden_dims,)),
        }
    gain = np.sqrt(2.0)  # relu gain (layers.py:132)
    for _ in range(n_layers):
        params["convs"].append(
            {
                "Q": {"w": _xavier(next(keys), (hidden_dims, hidden_dims), gain),
                      "b": jnp.zeros((hidden_dims,))},
                "W": {"w": _xavier(next(keys), (2 * hidden_dims, hidden_dims), gain),
                      "b": jnp.zeros((hidden_dims,))},
            }
        )
    params["bias"] = jnp.zeros((num_items,))
    return params


def project(
    params: dict,
    item_ids: jnp.ndarray,          # int32 [N] global ids
    item_features: jnp.ndarray,     # int32 [I, F] full table
    item_features_float: Optional[jnp.ndarray] = None,  # [I, D] or None
    id_rows: Optional[jnp.ndarray] = None,  # [N, H] pre-gathered id rows
) -> jnp.ndarray:
    """Sum of per-feature projections + id embedding (LinearProjector).

    ``id_rows`` lets the sparse-embedding training path (see
    ``train/optim.py``) differentiate w.r.t. just the gathered id rows
    instead of the full table."""
    feats = item_features[item_ids]
    out = (
        id_rows if id_rows is not None else params["proj"]["id_table"][item_ids]
    )
    for i, table in enumerate(params["proj"]["tables"]):
        ids = jnp.clip(feats[:, i], 0, table.shape[0] - 1)
        out = out + table[ids]
    if item_features_float is not None and "float_lin" in params["proj"]:
        lin = params["proj"]["float_lin"]
        out = out + item_features_float[item_ids] @ lin["w"] + lin["b"]
    return out


def _dropout(key, x, p, train):
    if not train or p <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def weighted_sage_conv(
    p: dict,
    block: PinSAGEBlock,
    h_src: jnp.ndarray,   # [S, H]
    train: bool,
    rng: jax.Array,
    dropout_p: float = 0.5,
) -> jnp.ndarray:
    """One WeightedSAGEConv step → [D, H] (``layers.py:138-156``)."""
    k1, k2 = jax.random.split(rng)
    n = jax.nn.relu(
        _dropout(k1, h_src, dropout_p, train) @ p["Q"]["w"] + p["Q"]["b"]
    )
    d = block.dst_ids.shape[0]
    msgs = n[block.edge_src] * block.edge_w[:, None]
    agg = jax.ops.segment_sum(msgs, block.edge_dst, num_segments=d)
    ws = jax.ops.segment_sum(block.edge_w, block.edge_dst, num_segments=d)
    ws = jnp.maximum(ws, 1.0)[:, None]
    h_dst = h_src[:d]  # dst nodes lead the src slot layout
    z = jnp.concatenate([agg / ws, h_dst], axis=-1)
    z = jax.nn.relu(_dropout(k2, z, dropout_p, train) @ p["W"]["w"] + p["W"]["b"])
    norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
    return z / jnp.where(norm == 0.0, 1.0, norm)


def get_repr(
    params: dict,
    blocks: List[PinSAGEBlock],
    item_features: jnp.ndarray,
    item_features_float: Optional[jnp.ndarray],
    train: bool = False,
    rng: Optional[jax.Array] = None,
    id_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Item representations on the innermost dst set (``model.py:30-33``).

    ``id_rows`` (aligned with ``blocks[0].src_ids``) drives the sparse-
    embedding path; every inner block layout is a prefix of the outermost
    src layout by construction, so slices of ``id_rows`` serve the dst
    projection too."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    h = project(
        params, blocks[0].src_ids, item_features, item_features_float, id_rows
    )
    for p, block in zip(params["convs"], blocks):
        rng, k = jax.random.split(rng)
        h = weighted_sage_conv(p, block, h, train, k)
    d_last = blocks[-1].dst_ids.shape[0]
    h_dst = project(
        params, blocks[-1].dst_ids, item_features, item_features_float,
        id_rows[:d_last] if id_rows is not None else None,
    )
    return h_dst + h


def score_pairs(
    params: dict,
    h: jnp.ndarray,          # [D, H] reprs on the innermost dst slots
    dst_ids: jnp.ndarray,    # int32 [D] global ids of those slots
    head: jnp.ndarray,
    tail: jnp.ndarray,
    bias_rows: Optional[jnp.ndarray] = None,  # [D] pre-gathered biases
) -> jnp.ndarray:
    """u·v + bias_u + bias_v (ItemToItemScorer, ``layers.py:193-203``)."""
    s = jnp.sum(h[head] * h[tail], axis=-1)
    if bias_rows is not None:
        return s + bias_rows[head] + bias_rows[tail]
    return s + params["bias"][dst_ids[head]] + params["bias"][dst_ids[tail]]


def margin_loss(
    params: dict,
    batch: PinSAGEBatch,
    item_features: jnp.ndarray,
    item_features_float: Optional[jnp.ndarray],
    train: bool = True,
    rng: Optional[jax.Array] = None,
    id_rows: Optional[jnp.ndarray] = None,
    bias_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked mean of (neg − pos + 1)₊ (``model.py:24-28``)."""
    h = get_repr(
        params, batch.blocks, item_features, item_features_float, train, rng,
        id_rows,
    )
    dst_ids = batch.blocks[-1].dst_ids
    pos = score_pairs(params, h, dst_ids, batch.pos_head, batch.pos_tail, bias_rows)
    neg = score_pairs(params, h, dst_ids, batch.neg_head, batch.neg_tail, bias_rows)
    hinge = jnp.maximum(neg - pos + 1.0, 0.0)
    m = batch.pair_mask.astype(hinge.dtype)
    return jnp.sum(hinge * m) / jnp.maximum(jnp.sum(m), 1.0)
