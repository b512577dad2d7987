"""Heterogeneous SAGE encoder-decoder for link-prediction ranking.

TPU-native re-design of reference ``model/encoder_decoder.py:17-164`` +
``model/layers.py:6-56``. Where the reference traces a homogeneous encoder
through PyG's ``to_hetero`` FX transform (``model/encoder_decoder.py:93-95``),
here the per-edge-type parameter replication and per-destination aggregation
(sum/mean/min/max/mul — the ``heterogeneous_prop_agg_type``) are written
explicitly: each layer owns one SAGE conv per edge type, node outputs combine
incoming edge types directly. No tracing, no lazy shapes — input dims are
computed statically from the feature-embedding policy.

Structure per forward:
1. categorical feature embeddings per node type, sized by the
   cardinality→dim table (``configs.embedding_range_dict``; reference
   ``model/encoder_decoder.py:103-114``) with the max_norm=1 renorm applied
   at lookup,
2. L layers of bipartite SAGE message passing over the padded subgraph
   edges (aggr = ``conv_agg_type``: add/mean/max; out = lin_l(agg) +
   lin_r(x_dst), matching PyG SAGEConv), feature dropout + ReLU on non-last
   layers (``model/encoder_decoder.py:29-46``),
3. BatchNorm1d on the final user/item embeddings (``:98-99,144-150``) with
   masked batch statistics + running stats,
4. MLP edge decoder over concat(z_user ‖ z_item) at the label edges
   (``:49-72``) producing one logit per label edge.

The batch's label edges live on a dense [B, L] per-user grid, so ``infer``
(padded per-user score matrix, pad = -2⁵⁰ as in ``:164``) is a masked fill —
no ragged regrouping.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config, embedding_size_for_cardinality
from ..constants import NODE_EXTRA, NODE_ITEM, NODE_USER
from ..data.graph import HeteroGraph
from ..data.sampler import SubgraphBatch
from ..types import FeatureInfo

INFER_PAD = -float(1 << 50)  # reference model/encoder_decoder.py:164


def get_feature_info(g: HeteroGraph) -> Dict[str, FeatureInfo]:
    """Per-node-type categorical metadata (reference ``utils/get_info.py:17-36``)."""
    out = {}
    for node_type, x in g.node_features.items():
        num_cat = np.max(x, axis=0).tolist() if len(x) else []
        out[node_type] = FeatureInfo(
            num_feat=x.shape[1],
            num_cat=[int(c) for c in num_cat],
            embedding_size=[embedding_size_for_cardinality(int(c)) for c in num_cat],
        )
    return out


def _linear_init(key, fan_in, fan_out, bias=True):
    """torch.nn.Linear default init (kaiming-uniform bound 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(max(fan_in, 1))
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound)
    if not bias:
        return {"w": w}
    b = jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def init_sage_params(
    key: jax.Array, cfg: Config, feature_info: Dict[str, FeatureInfo],
    float_dims: Optional[Dict[str, int]] = None,
    num_extra: int = 0,
    mesh=None,
) -> Tuple[dict, dict]:
    """Returns (params, bn_state) pytrees.

    With a ``mesh`` whose ``model`` axis is >1, every categorical feature
    table is row-padded to divide the axis and placed row-sharded — the
    production scale-out for tables past one chip's HBM (H&M postal-code
    cardinality ~1M; SURVEY §2b ``nn.Embedding`` obligation). Lookups then
    go through ``ops/embedding.sharded_embedding_lookup``. The pad is
    appended AFTER init so true rows match the unsharded run bit-for-bit.

    ``float_dims[node_type]`` declares non-categorical feature widths (e.g.
    the 512-d CLIP image/text embeddings H&M preprocessing concatenates,
    reference ``run_preprocessing_fashion.py:129-162,201-204``) — they are
    appended to the encoder input after the categorical embeddings.

    ``num_extra > 0`` enables the optional third node type (colour group,
    reference ``utils/constants.py:12-21`` / ``run_preprocessing_fashion.py:
    86-112``): an identity embedding for the ``num_extra`` colour-group
    nodes plus per-layer ``item↔extra`` SAGE convs along the ``has_color``
    edges. Item outputs then combine the two incoming edge types with the
    ``heterogeneous_prop_agg_type`` — the to_hetero multi-relation
    aggregation the two-type default never exercises."""
    keys = iter(jax.random.split(key, 1024))

    params: dict = {"embeddings": {}, "convs": [], "decoder": [], "bn": {}}
    in_dim: Dict[str, int] = {}
    for node_type, info in feature_info.items():
        tables = []
        for c, d in zip(info.num_cat, info.embedding_size):
            tables.append(jax.random.normal(next(keys), (c + 1, d)))
        params["embeddings"][node_type] = tables
        in_dim[node_type] = int(sum(info.embedding_size))
        if float_dims:
            in_dim[node_type] += int(float_dims.get(node_type, 0))
    if num_extra > 0 and NODE_EXTRA not in feature_info:
        # graphs without explicit colour-group features get an identity
        # embedding (node id as the single categorical column)
        d_e = embedding_size_for_cardinality(num_extra)
        params["embeddings"][NODE_EXTRA] = [
            jax.random.normal(next(keys), (num_extra, d_e))
        ]
        in_dim[NODE_EXTRA] = d_e

    # conv stack: hidden × (num_gnn_layers-1) then output layer
    dims = (
        [cfg.hidden_layer_size] * (cfg.num_gnn_layers - 1)
        + [cfg.encoder_layer_output_size]
    )
    src_dims = dict(in_dim)
    conv_dirs = {
        "item_to_user": (NODE_ITEM, NODE_USER),
        "user_to_item": (NODE_USER, NODE_ITEM),
    }
    if num_extra > 0:
        conv_dirs["extra_to_item"] = (NODE_EXTRA, NODE_ITEM)
        conv_dirs["item_to_extra"] = (NODE_ITEM, NODE_EXTRA)
    for out_dim in dims:
        layer = {}
        # one conv per typed edge direction: messages flow src→dst.
        for name, (src, dst) in conv_dirs.items():
            layer[name] = {
                "lin_l": _linear_init(next(keys), src_dims[src], out_dim, bias=True),
                "lin_r": _linear_init(next(keys), src_dims[dst], out_dim, bias=False),
            }
        params["convs"].append(layer)
        src_dims = {t: out_dim for t in src_dims}

    d_out = cfg.encoder_layer_output_size
    if cfg.batch_norm:
        for node_type in (NODE_USER, NODE_ITEM):
            params["bn"][node_type] = {
                "scale": jnp.ones((d_out,)),
                "bias": jnp.zeros((d_out,)),
            }
    bn_state = {
        node_type: {"mean": jnp.zeros((d_out,)), "var": jnp.ones((d_out,))}
        for node_type in (NODE_USER, NODE_ITEM)
    }

    # decoder MLP: [2*d_out → hidden ... → 1] (model/layers.py:35-56)
    dec_dims = (
        [2 * d_out]
        + [cfg.hidden_layer_size] * (cfg.num_linear_layers - 1)
        + [1]
    )
    if cfg.num_linear_layers == 1:
        dec_dims = [2 * d_out, 1]
    for i in range(len(dec_dims) - 1):
        params["decoder"].append(
            _linear_init(next(keys), dec_dims[i], dec_dims[i + 1], bias=True)
        )

    if mesh is not None:
        from ..parallel.mesh import MODEL_AXIS, round_up, row_sharding

        parts = mesh.shape[MODEL_AXIS]
        if parts > 1:
            sharding = row_sharding(mesh)
            for node_type, tables in params["embeddings"].items():
                params["embeddings"][node_type] = [
                    jax.device_put(
                        jnp.pad(
                            t,
                            ((0, round_up(t.shape[0], parts) - t.shape[0]), (0, 0)),
                        ),
                        sharding,
                    )
                    for t in tables
                ]
    return params, bn_state


def _embed_features(
    tables: List[jnp.ndarray], x: jnp.ndarray, mesh=None,
) -> jnp.ndarray:
    """Concat per-column embedding lookups with max_norm=1 renorm
    (reference ``model/encoder_decoder.py:103-125``).

    With a model-sharded ``mesh`` the gather runs through the cross-shard
    lookup (``ops/embedding.sharded_embedding_lookup``): each shard
    contributes the rows it owns, one psum over the model axis assembles
    the replicated [B, d] block."""
    lookup = None
    if mesh is not None:
        from ..ops.embedding import sharded_embedding_lookup
        from ..parallel.mesh import MODEL_AXIS

        if mesh.shape[MODEL_AXIS] > 1:
            lookup = partial(sharded_embedding_lookup, mesh)
    cols = []
    for i, table in enumerate(tables):
        ids = jnp.clip(x[:, i], 0, table.shape[0] - 1)
        rows = lookup(table, ids) if lookup is not None else table[ids]
        norm = jnp.linalg.norm(rows, axis=-1, keepdims=True)
        rows = rows / jnp.maximum(norm, 1.0)
        cols.append(rows)
    return jnp.concatenate(cols, axis=-1)


def _aggregate(
    messages: jnp.ndarray,   # [E, D] already masked (0 for invalid)
    dst: jnp.ndarray,        # int32 [E]
    valid: jnp.ndarray,      # bool [E]
    num_dst: int,
    agg: str,
) -> jnp.ndarray:
    if agg == "add":
        return jax.ops.segment_sum(messages, dst, num_segments=num_dst)
    if agg == "mean":
        s = jax.ops.segment_sum(messages, dst, num_segments=num_dst)
        cnt = jax.ops.segment_sum(
            valid.astype(messages.dtype)[:, None], dst, num_segments=num_dst
        )
        return s / jnp.maximum(cnt, 1.0)
    if agg == "max":
        neg = jnp.where(valid[:, None], messages, -jnp.inf)
        m = jax.ops.segment_max(neg, dst, num_segments=num_dst)
        return jnp.where(jnp.isfinite(m), m, 0.0)
    raise ValueError(f"unknown conv_agg_type {agg}")


def _combine_hetero(stacks: List[jnp.ndarray], agg: str) -> jnp.ndarray:
    """Per-destination aggregation over incoming edge types — the to_hetero
    ``aggr`` semantics (reference ``temporary_hetero.py:171-228``)."""
    if len(stacks) == 1:
        return stacks[0]
    s = jnp.stack(stacks)
    if agg == "sum":
        return jnp.sum(s, 0)
    if agg == "mean":
        return jnp.mean(s, 0)
    if agg == "min":
        return jnp.min(s, 0)
    if agg == "max":
        return jnp.max(s, 0)
    if agg == "mul":
        return jnp.prod(s, 0)
    raise ValueError(f"unknown heterogeneous_prop_agg_type {agg}")


def _batch_norm(
    x: jnp.ndarray, mask: jnp.ndarray, p: dict, state: dict,
    train: bool, momentum: float = 0.1, eps: float = 1e-5,
) -> Tuple[jnp.ndarray, dict]:
    """Masked BatchNorm1d with running stats (reference BatchNorm1d at
    ``model/encoder_decoder.py:98-99``)."""
    if train:
        m = mask.astype(x.dtype)[:, None]
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(x * m, axis=0) / n
        var = jnp.sum(((x - mean) ** 2) * m, axis=0) / n
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"]
            + momentum * var * n / jnp.maximum(n - 1.0, 1.0),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"], new_state


def _dropout(key, x, p, train):
    if not train or p is None or p <= 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    return jnp.where(keep, x / (1.0 - p), 0.0)


def encode(
    params: dict,
    bn_state: dict,
    batch: SubgraphBatch,
    user_features: jnp.ndarray,   # int32 [num_users, F_u] full table on device
    item_features: jnp.ndarray,   # int32 [num_items, F_i]
    cfg: Config,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    user_features_float: Optional[jnp.ndarray] = None,  # f32 [num_users, Dfu]
    item_features_float: Optional[jnp.ndarray] = None,  # f32 [num_items, Dfi]
    item_extra_ids: Optional[jnp.ndarray] = None,       # int32 [num_items]
    extra_features: Optional[jnp.ndarray] = None,       # int32 [num_extra, F_e]
    mesh=None,
) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """Run embeddings + hetero SAGE stack. Returns (z_user, z_item, bn_state).

    ``item_extra_ids`` maps every global item to its colour-group node, or
    -1 for items with no ``has_color`` edge (the edge list carries at most
    one edge per item, reference ``run_preprocessing_fashion.py:86-112``;
    edge-less items exchange no extra-type messages). When given — and the params
    were built with ``num_extra > 0`` — all colour-group nodes join the
    batch (the type is tiny, so no sampling is needed) and items aggregate
    over both incoming edge types."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    extra_active = (
        item_extra_ids is not None and NODE_EXTRA in params["embeddings"]
    )
    x_user = _embed_features(
        params["embeddings"][NODE_USER], user_features[batch.user_ids], mesh
    )
    x_item = _embed_features(
        params["embeddings"][NODE_ITEM], item_features[batch.item_ids], mesh
    )
    if user_features_float is not None:
        x_user = jnp.concatenate(
            [x_user, user_features_float[batch.user_ids]], axis=-1
        )
    if item_features_float is not None:
        x_item = jnp.concatenate(
            [x_item, item_features_float[batch.item_ids]], axis=-1
        )
    x_user = x_user * batch.user_mask[:, None]
    x_item = x_item * batch.item_mask[:, None]

    x_extra = None
    e_of_item = None
    has_extra_edge = None
    if extra_active:
        if extra_features is None:
            # identity feature: each colour-group node embeds its own id
            ne = params["embeddings"][NODE_EXTRA][0].shape[0]
            extra_features = jnp.arange(ne, dtype=jnp.int32)[:, None]
        ne = extra_features.shape[0]
        x_extra = _embed_features(
            params["embeddings"][NODE_EXTRA], extra_features, mesh
        )
        raw_extra = item_extra_ids[batch.item_ids]
        # -1 marks items with no has_color edge: no message either way
        has_extra_edge = batch.item_mask & (raw_extra >= 0)
        e_of_item = jnp.clip(raw_extra, 0, ne - 1)

    num_layers = len(params["convs"])
    nu = x_user.shape[0]
    ni = x_item.shape[0]
    emask = batch.edge_mask

    # Dense-adjacency MXU fast path. The conv hot loop is otherwise per-edge
    # gathers + segment sums, which on TPU are bound by the fixed row-gather
    # rate (see ops/spmm_pallas.py notes), not by FLOPs or HBM bytes. When
    # the [NU, NI] subgraph adjacency fits the budget we materialize it ONCE
    # per step (a single scalar scatter of the edge mask) and every layer's
    # aggregation in both directions — forward and backward — becomes a
    # matmul against it. Entries count duplicate (u, i) edges, so add/mean
    # results match the segment path exactly (mean divides by the same
    # per-destination valid-edge count = A row/col sums). "max" aggregation
    # is not a matmul; it keeps the segment path.
    dense_budget = getattr(cfg, "dense_bytes_budget", 0) or 0
    use_dense = (
        cfg.conv_agg_type in ("add", "mean")
        and 0 < 2 * nu * ni * 4 <= dense_budget
    )
    if use_dense:
        adj = jnp.zeros((nu, ni), jnp.float32)
        adj = adj.at[batch.edge_src, batch.edge_dst].add(
            emask.astype(jnp.float32)
        )
        if cfg.conv_agg_type == "mean":
            inv_deg_u = 1.0 / jnp.maximum(jnp.sum(adj, axis=1, keepdims=True), 1.0)
            inv_deg_i = 1.0 / jnp.maximum(jnp.sum(adj, axis=0)[:, None], 1.0)

    def _agg_user(x_item_cur):
        """Aggregate item messages into user slots (dst = edge_src)."""
        if use_dense:
            agg = jnp.dot(adj, x_item_cur, preferred_element_type=jnp.float32)
            return agg * inv_deg_u if cfg.conv_agg_type == "mean" else agg
        msgs = jnp.where(emask[:, None], x_item_cur[batch.edge_dst], 0.0)
        return _aggregate(msgs, batch.edge_src, emask, nu, cfg.conv_agg_type)

    def _agg_item(x_user_cur):
        """Aggregate user messages into item slots (dst = edge_dst)."""
        if use_dense:
            agg = jnp.einsum(
                "ui,ud->id", adj, x_user_cur,
                preferred_element_type=jnp.float32,
            )
            return agg * inv_deg_i if cfg.conv_agg_type == "mean" else agg
        msgs = jnp.where(emask[:, None], x_user_cur[batch.edge_src], 0.0)
        return _aggregate(msgs, batch.edge_dst, emask, ni, cfg.conv_agg_type)

    for li, layer in enumerate(params["convs"]):
        last = li == num_layers - 1
        if not last:
            rng, k1, k2, k3 = jax.random.split(rng, 4)
            x_user = _dropout(k1, x_user, cfg.p_dropout_features, train)
            x_item = _dropout(k2, x_item, cfg.p_dropout_features, train)
            if extra_active:
                x_extra = _dropout(k3, x_extra, cfg.p_dropout_features, train)

        # item → user along reverse edges (dst = user slots)
        agg_u = _agg_user(x_item)
        p = layer["item_to_user"]
        out_u = agg_u @ p["lin_l"]["w"] + p["lin_l"]["b"] + x_user @ p["lin_r"]["w"]
        out_u = _combine_hetero([out_u], cfg.heterogeneous_prop_agg_type)

        # user → item along forward edges (dst = item slots)
        agg_i = _agg_item(x_user)
        p = layer["user_to_item"]
        out_i = agg_i @ p["lin_l"]["w"] + p["lin_l"]["b"] + x_item @ p["lin_r"]["w"]
        item_stacks = [out_i]

        out_e = None
        if extra_active:
            # extra → item: an item has at most one has_color edge, so the
            # per-destination aggregation is the single message itself
            # (identical under add/mean/max); edge-less items get none
            p = layer["extra_to_item"]
            agg_ie = x_extra[e_of_item] * has_extra_edge[:, None]
            item_stacks.append(
                agg_ie @ p["lin_l"]["w"] + p["lin_l"]["b"]
                + x_item @ p["lin_r"]["w"]
            )
            # item → extra along the same edges (dst = colour groups)
            p = layer["item_to_extra"]
            msgs_e = x_item * has_extra_edge[:, None]
            agg_e = _aggregate(
                msgs_e, e_of_item, has_extra_edge,
                x_extra.shape[0], cfg.conv_agg_type,
            )
            out_e = (
                agg_e @ p["lin_l"]["w"] + p["lin_l"]["b"]
                + x_extra @ p["lin_r"]["w"]
            )

        out_i = _combine_hetero(item_stacks, cfg.heterogeneous_prop_agg_type)

        if not last:
            out_u = jax.nn.relu(out_u)
            out_i = jax.nn.relu(out_i)
            if out_e is not None:
                out_e = jax.nn.relu(out_e)
        x_user, x_item = out_u, out_i
        if extra_active:
            x_extra = out_e

    new_bn_state = bn_state
    if cfg.batch_norm:
        x_user, s_u = _batch_norm(
            x_user, batch.user_mask, params["bn"][NODE_USER],
            bn_state[NODE_USER], train,
        )
        x_item, s_i = _batch_norm(
            x_item, batch.item_mask, params["bn"][NODE_ITEM],
            bn_state[NODE_ITEM], train,
        )
        new_bn_state = {NODE_USER: s_u, NODE_ITEM: s_i}
    return x_user, x_item, new_bn_state


def decode(
    params: dict,
    z_user: jnp.ndarray,
    z_item: jnp.ndarray,
    batch: SubgraphBatch,
    cfg: Config,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """MLP edge decoder over the [B, L] label grid → logits [B, L]
    (reference ``model/encoder_decoder.py:49-72``)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    z = jnp.concatenate(
        [z_user[batch.label_src], z_item[batch.label_dst]], axis=-1
    )  # [B, L, 2D]
    n = len(params["decoder"])
    for i, lin in enumerate(params["decoder"]):
        last = i == n - 1
        if not last:
            rng, k = jax.random.split(rng)
            z = _dropout(k, z, cfg.p_dropout_features, train)
        z = z @ lin["w"] + lin["b"]
        if not last:
            z = jax.nn.relu(z)
    return z[..., 0]


def forward(
    params, bn_state, batch: SubgraphBatch,
    user_features, item_features, cfg: Config,
    train: bool = False, rng: Optional[jax.Array] = None,
    user_features_float=None, item_features_float=None,
    item_extra_ids=None, extra_features=None, mesh=None,
) -> Tuple[jnp.ndarray, dict]:
    """Full model: logits [B, L] + new bn state (reference
    ``Encoder_Decoder_Model.forward``, ``model/encoder_decoder.py:135-153``)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    z_u, z_i, bn_state = encode(
        params, bn_state, batch, user_features, item_features, cfg, train, k1,
        user_features_float, item_features_float, item_extra_ids,
        extra_features, mesh,
    )
    logits = decode(params, z_u, z_i, batch, cfg, train, k2)
    return logits, bn_state


def infer(
    params, bn_state, batch: SubgraphBatch,
    user_features, item_features, cfg: Config,
    user_features_float=None, item_features_float=None,
    item_extra_ids=None, extra_features=None, mesh=None,
) -> jnp.ndarray:
    """Eval-mode per-user padded score matrix [B, L]; invalid slots filled
    with -2⁵⁰ (reference ``model/encoder_decoder.py:155-164``)."""
    logits, _ = forward(
        params, bn_state, batch, user_features, item_features, cfg, train=False,
        user_features_float=user_features_float,
        item_features_float=item_features_float,
        item_extra_ids=item_extra_ids,
        extra_features=extra_features,
        mesh=mesh,
    )
    return jnp.where(batch.label_mask, logits, INFER_PAD)


def bce_loss(logits: jnp.ndarray, batch: SubgraphBatch) -> jnp.ndarray:
    """Masked BCEWithLogits over the label grid (reference ``training.py:26-31``)."""
    per_edge = optax_sigmoid_bce(logits, batch.label)
    m = batch.label_mask.astype(logits.dtype)
    return jnp.sum(per_edge * m) / jnp.maximum(jnp.sum(m), 1.0)


def optax_sigmoid_bce(logits, labels):
    # stable BCE-with-logits: max(x,0) - x*y + log(1+exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
