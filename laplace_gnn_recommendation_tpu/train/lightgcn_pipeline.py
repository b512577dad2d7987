"""LightGCN training / eval / artifact-export pipeline.

TPU-native counterpart of reference ``run_pipeline_lightgcn.py:20-242``:

* full-graph K-hop forward each step (one fused jit: forward → BPR minibatch
  → grads → Adam update; the reference pays a CPU↔GPU round trip per step for
  its negative sampler — here sampling happens on-device inside the step),
* ExponentialLR(0.95)-every-``lr_decay_every`` schedule (reference
  ``run_pipeline_lightgcn.py:104,178-179``) via optax staircase decay,
* eval = BPR loss over the eval split + batched recall/precision/NDCG@k with
  train-edge exclusion (reference ``run_pipeline_lightgcn.py:20-73``),
* artifact export: per-user top-``num_recommendations`` item ids (the matcher
  hand-off, reference ``run_pipeline_lightgcn.py:211-222``) + embedding
  tables (``:235-238``).

Scoring embeddings: the reference's metrics and export consume the **E⁰**
tables, not the propagated finals (``utils/metrics_lightgcn.py:93-94``,
``run_pipeline_lightgcn.py:215-221``) — `eval_embeddings="e0"` (default)
reproduces that; `"final"` scores with the diffused embeddings as in the
LightGCN paper.
"""
from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import LightGCNConfig
from ..data.graph import BipartiteGraph
from ..data.lightgcn_data import EvalSet, LightGCNData
from ..models.lightgcn import LightGCNParams, bpr_loss, init_lightgcn, lightgcn_forward
from ..ops.metrics import topk_hits
from ..ops.sampling import sample_bpr_batch, structured_negative_sampling
from ..ops.topk import masked_topk
from ..parallel.mesh import DATA_AXIS, MODEL_AXIS, build_mesh, row_sharding
from .reporting import Stats


# jitted K-hop forward for eval/export paths (eager dispatch over the
# remote-device relay costs minutes at H&M scale)
_forward_jit = partial(jax.jit, static_argnames=("num_iterations",))(
    lightgcn_forward
)


def _user_row_ptr(g: BipartiteGraph) -> jnp.ndarray:
    """CSR row pointers over the user-major edge ordering."""
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(g.user_deg).astype(jnp.int32)]
    )


def maybe_dense(cfg: LightGCNConfig, graph: BipartiteGraph):
    """Pick the fastest SINGLE-DEVICE propagation operand for
    ``lightgcn_forward``: dense MXU adjacency when it fits the budget, else
    the blocked one-hot-matmul layout (3.6× over plain segment-sum)."""
    from ..ops.spmm_blocked import BlockedGraph
    from ..ops.spmm_dense import DenseAdjacency, dense_fits

    if cfg.dense_bytes_budget and dense_fits(
        graph.num_users, graph.num_items, cfg.dense_bytes_budget
    ):
        return DenseAdjacency.from_graph(graph)
    if graph.num_edges > 0:
        return BlockedGraph.from_graph(graph)
    return graph


def select_propagation(cfg: LightGCNConfig, graph: BipartiteGraph, mesh=None):
    """Production propagation-operand selection (``cfg.propagation``).

    ``auto`` picks the multi-chip sharded SpMM whenever the mesh's ``model``
    axis is >1 (row-sharded tables + all-gather/segment-sum per direction,
    the scale-out path for graphs past one chip's HBM), else the fastest
    single-device operand via :func:`maybe_dense`. Explicit values pin a
    path (``plain`` is the numerical reference; the sharded path on a
    1-wide model axis degenerates to it bit-for-bit, which the 8-device
    parity tests rely on)."""
    from ..ops.spmm_sharded import ShardedBipartiteGraph

    mode = getattr(cfg, "propagation", "auto")
    model_parts = mesh.shape[MODEL_AXIS] if mesh is not None else 1
    if mode == "plain":
        return graph
    if mode == "sharded" or (mode == "auto" and model_parts > 1):
        assert mesh is not None, "sharded propagation needs a mesh"
        return ShardedBipartiteGraph.from_graph(graph, mesh)
    if mode == "dense":
        from ..ops.spmm_dense import DenseAdjacency

        return DenseAdjacency.from_graph(graph)
    if mode == "blocked":
        from ..ops.spmm_blocked import BlockedGraph

        return _maybe_bf16(BlockedGraph.from_graph(graph), graph)
    if mode == "pallas":
        # Selectable for measurement parity, NOT auto-picked: the Pallas
        # revisiting-accumulator segsum ties the blocked path at ML-1M
        # scale and LOSES at H&M scale because ``pallas_call`` forces the
        # XLA-gathered message tiles to materialize in HBM and be re-read
        # (one extra [E, D] round-trip ≈ 2.75 GB/direction at 21.5M edges)
        # while the blocked path fuses the gather into its contraction —
        # see the measured dead-end note in ``ops/spmm_pallas.py`` and the
        # pallas_segsum row of ROOFLINE.json. It becomes the fast path only
        # if Mosaic grows a multi-vreg in-kernel gather.
        from ..ops.spmm_pallas import PallasGraph

        return PallasGraph.from_graph(graph)
    assert mode == "auto", f"unknown propagation mode {mode!r}"
    op = maybe_dense(cfg, graph)
    from ..ops.spmm_blocked import BlockedGraph

    if isinstance(op, BlockedGraph):
        op = _maybe_bf16(op, graph)
    return op


# Node-table size above which the blocked SpMM gathers in bf16: the gather
# rate collapses on large tables (v5e: 39M rows/s f32 vs 75M rows/s bf16 on
# the 1.37M-row H&M user table; no effect below cache scale) — see
# ``ops/spmm_blocked.blocked_segment_sum``.
BF16_GATHER_ROWS = 1 << 19


def _maybe_bf16(op, graph: BipartiteGraph):
    import dataclasses as _dc

    if max(graph.num_users, graph.num_items) >= BF16_GATHER_ROWS:
        op = _dc.replace(op, gather_bf16=True)
    return op


def make_train_step(
    cfg: LightGCNConfig, graph: BipartiteGraph, max_degree: int, mesh=None,
    prop_graph=None,
):
    """Build the fused jitted train step. Returns (step_fn, optimizer).

    With a multi-device ``mesh``, the BPR minibatch is constrained onto the
    ``data`` axis (DP) while the tables stay row-sharded on ``model`` (TP) —
    XLA inserts the all-to-all row exchanges and gradient psums.
    """
    schedule = optax.exponential_decay(
        init_value=cfg.learning_rate,
        transition_steps=cfg.lr_decay_every,
        decay_rate=0.95,
        staircase=True,
    )
    tx = optax.adam(learning_rate=schedule)
    row_ptr = _user_row_ptr(graph)
    if prop_graph is None:
        prop_graph = graph

    batch_constraint = None
    if mesh is not None and mesh.shape[DATA_AXIS] > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_constraint = NamedSharding(mesh, P(DATA_AXIS))

    # The graph operands ride as jit ARGUMENTS, not closure constants:
    # closed-over device arrays get embedded in the HLO as literals, which
    # at H&M scale (~700 MB of blocked-plan arrays) overflows the remote
    # compiler's request limits — and bloats every compile cache entry.
    @partial(jax.jit, donate_argnums=(0, 1))
    def _step(params: LightGCNParams, opt_state, key: jax.Array,
              graph_arg, prop_arg, row_ptr_arg):
        u, pos, neg = sample_bpr_batch(
            key,
            graph_arg.edge_user,
            graph_arg.edge_item,
            graph_arg.num_edges,
            cfg.batch_size,
            row_ptr_arg,
            graph_arg.edge_item,
            graph_arg.num_items,
            max_degree,
        )
        if batch_constraint is not None:
            u = jax.lax.with_sharding_constraint(u, batch_constraint)
            pos = jax.lax.with_sharding_constraint(pos, batch_constraint)
            neg = jax.lax.with_sharding_constraint(neg, batch_constraint)

        def loss_fn(p: LightGCNParams):
            uf, u0, itf, it0 = lightgcn_forward(p, prop_arg, cfg.num_iterations)
            return bpr_loss(
                uf[u], u0[u], itf[pos], it0[pos], itf[neg], it0[neg],
                cfg.Lambda, cfg.bpr_variant,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(params: LightGCNParams, opt_state, key: jax.Array):
        return _step(params, opt_state, key, graph, prop_graph, row_ptr)

    return step, tx


@partial(
    jax.jit,
    static_argnames=(
        "num_items", "num_iterations", "max_degree", "lambda_val", "variant",
    ),
)
def _eval_loss_jit(
    params, prop_graph, eu, ei, n_valid, row_ptr, graph_edge_item, num_items,
    key, num_iterations, max_degree, lambda_val, variant,
):
    neg = structured_negative_sampling(
        key, eu, row_ptr, graph_edge_item, num_items, max_degree
    )
    uf, u0, itf, it0 = lightgcn_forward(params, prop_graph, num_iterations)
    # masked bpr_loss: eu/ei are padded up to a shape bucket (see eval_loss);
    # pad rows must contribute to neither the rank mean nor the reg term
    m = (jnp.arange(eu.shape[0]) < n_valid).astype(jnp.float32)
    n = jnp.maximum(n_valid.astype(jnp.float32), 1.0)
    reg = lambda_val * jnp.sum(
        m[:, None] * (u0[eu] ** 2 + it0[ei] ** 2 + it0[neg] ** 2)
    )
    diff = jnp.sum(uf[eu] * itf[ei], -1) - jnp.sum(uf[eu] * itf[neg], -1)
    if variant == "legacy":
        rank = -jnp.sum(jax.nn.softplus(diff) * m) / n
    else:
        rank = -jnp.sum(jax.nn.log_sigmoid(diff) * m) / n
    return rank + reg


def eval_loss(
    cfg: LightGCNConfig,
    params: LightGCNParams,
    eval_graph: BipartiteGraph,
    eval_set: EvalSet,
    key: jax.Array,
    max_degree: int,
    prop_graph=None,
) -> jnp.ndarray:
    """BPR loss over every edge of the eval split with one sampled negative
    each — reference ``run_pipeline_lightgcn.py:36-67``. One fused jit (the
    graph rides as an argument): an eager op-by-op pass costs minutes over
    the remote-device relay at H&M scale. Edge arrays pad to 4096-multiples
    (masked out of the loss) so near-equal-sized splits — val and test are
    always within a rounding edge of each other — share one executable."""
    e = len(eval_set.edge_user)
    e_pad = -(-max(e, 1) // 4096) * 4096
    eu = np.zeros(e_pad, np.int32)
    ei = np.zeros(e_pad, np.int32)
    eu[:e] = eval_set.edge_user
    ei[:e] = eval_set.edge_item
    return _eval_loss_jit(
        params,
        prop_graph if prop_graph is not None else eval_graph,
        jnp.asarray(eu),
        jnp.asarray(ei),
        jnp.int32(e),
        _user_row_ptr(eval_graph),
        eval_graph.edge_item,
        num_items=eval_graph.num_items,
        key=key,
        num_iterations=cfg.num_iterations,
        max_degree=max_degree,
        lambda_val=cfg.Lambda,
        variant=cfg.bpr_variant,
    )


def _metrics_from_topk(
    topk_items: jnp.ndarray,   # int32 [C, k]
    gt_items: jnp.ndarray,     # [C, G]
    gt_count: jnp.ndarray,     # [C]
    valid: jnp.ndarray,        # bool [C] chunk padding mask
    k: int,
):
    """(recall_sum, hits_sum, ndcg_sum, n) from a top-k id matrix."""
    r = topk_hits(topk_items, gt_items, gt_count)
    mask = valid & (gt_count > 0)
    n = jnp.sum(mask)
    hits = jnp.sum(r, axis=-1).astype(jnp.float32)
    recall_sum = jnp.sum(
        jnp.where(mask, hits / jnp.maximum(gt_count.astype(jnp.float32), 1.0), 0.0)
    )
    hits_sum = jnp.sum(jnp.where(mask, hits, 0.0))
    discounts = 1.0 / jnp.log2(jnp.arange(2, k + 2, dtype=jnp.float32))
    dcg = jnp.sum(r.astype(jnp.float32) * discounts[None, :], axis=-1)
    ideal_mask = jnp.arange(k)[None, :] < jnp.minimum(gt_count, k)[:, None]
    idcg = jnp.sum(ideal_mask.astype(jnp.float32) * discounts[None, :], axis=-1)
    ndcg = dcg / jnp.where(idcg == 0.0, 1.0, idcg)
    ndcg_sum = jnp.sum(jnp.where(mask, ndcg, 0.0))
    return recall_sum, hits_sum, ndcg_sum, n


@partial(jax.jit, static_argnames=("k",))
def _metrics_chunk(
    user_vecs: jnp.ndarray,    # [C, D]
    item_emb: jnp.ndarray,     # [I, D]
    gt_items: jnp.ndarray,     # [C, G]
    gt_count: jnp.ndarray,     # [C]
    excl_items: jnp.ndarray,   # [C, X]
    excl_count: jnp.ndarray,   # [C]
    valid: jnp.ndarray,        # bool [C] chunk padding mask
    k: int,
):
    scores = jnp.dot(user_vecs, item_emb.T, preferred_element_type=jnp.float32)
    _, topk_items = masked_topk(scores, k, excl_items, excl_count)
    return _metrics_from_topk(topk_items, gt_items, gt_count, valid, k)


# cache of jitted sharded metric chunks, keyed by (mesh, k, num_valid_items)
_SHARDED_METRICS_CACHE: dict = {}


def _sharded_metrics_chunk(mesh, k: int, num_valid_items: int):
    """Jitted chunk metrics on the distributed MIPS path: per-shard MXU
    scoring + all-gather top-k merge (``ops/topk.sharded_mips_topk``)."""
    cache_key = (mesh, k, num_valid_items)
    fn = _SHARDED_METRICS_CACHE.get(cache_key)
    if fn is None:
        from ..ops.topk import sharded_mips_topk

        @jax.jit
        def fn(user_vecs, item_emb, gt_items, gt_count, excl_items,
               excl_count, valid):
            _, topk_items = sharded_mips_topk(
                mesh, user_vecs, item_emb, k, excl_items, excl_count,
                num_valid_items=num_valid_items,
            )
            return _metrics_from_topk(topk_items, gt_items, gt_count, valid, k)

        _SHARDED_METRICS_CACHE[cache_key] = fn
    return fn


def get_metrics(
    params: LightGCNParams,
    cfg: LightGCNConfig,
    eval_set: EvalSet,
    graph_for_final: Optional[BipartiteGraph] = None,
    eval_embeddings: str = "e0",
    chunk: int = 1024,
    mesh=None,
    num_valid_items: Optional[int] = None,
) -> Tuple[float, float, float]:
    """recall/precision/ndcg@k over an eval split, chunked over users.

    Exact semantics of ``get_metrics_lightgcn`` (``utils/metrics_lightgcn.py:
    79-122``): scores = user·itemᵀ, train edges masked out, topk(k), hits vs
    the split's ground truth.

    With a mesh whose ``model`` axis is >1 the scoring runs the distributed
    MIPS path (per-shard MXU score + all-gather merge); ``num_valid_items``
    masks the dead pad tail of an internally-padded item table.
    """
    if eval_embeddings == "final":
        assert graph_for_final is not None
        uf, _, itf, _ = _forward_jit(
            params, graph_for_final, num_iterations=cfg.num_iterations
        )
        user_emb, item_emb = uf, itf
    else:
        user_emb, item_emb = params.user_emb, params.item_emb

    use_sharded = mesh is not None and mesh.shape[MODEL_AXIS] > 1
    if use_sharded:
        nvalid = int(
            num_valid_items if num_valid_items is not None
            else item_emb.shape[0]
        )
        chunk_fn = _sharded_metrics_chunk(mesh, cfg.k, nvalid)
    else:
        chunk_fn = partial(_metrics_chunk, k=cfg.k)

    users = eval_set.users
    cap = getattr(cfg, "eval_user_cap", None)
    if cap is not None and len(users) > cap:
        users = users[:cap]
    b = len(users)
    # bucket the padded gt/exclusion widths (multiples of 32) so the val and
    # test sweeps share one compiled chunk program — widths are -1-padded,
    # so extra columns are inert
    def _wpad(a):
        w = a.shape[1]
        return -(-w // 32) * 32 - w

    gt_w, ex_w = _wpad(eval_set.gt_items), _wpad(eval_set.exclude_items)
    rs = hs = ns = cnt = 0.0
    for s in range(0, b, chunk):
        e = min(s + chunk, b)
        c = e - s
        pad = chunk - c
        uu = np.pad(users[s:e], (0, pad))
        gt = np.pad(
            eval_set.gt_items[s:e], ((0, pad), (0, gt_w)), constant_values=-1
        )
        gtc = np.pad(eval_set.gt_count[s:e], (0, pad))
        ex = np.pad(
            eval_set.exclude_items[s:e], ((0, pad), (0, ex_w)),
            constant_values=-1,
        )
        exc = np.pad(eval_set.exclude_count[s:e], (0, pad))
        valid = np.arange(chunk) < c
        r_, h_, n_, m_ = chunk_fn(
            user_emb[jnp.asarray(uu)], item_emb,
            jnp.asarray(gt), jnp.asarray(gtc),
            jnp.asarray(ex), jnp.asarray(exc),
            jnp.asarray(valid),
        )
        rs += float(r_); hs += float(h_); ns += float(n_); cnt += float(m_)
    cnt = max(cnt, 1.0)
    return rs / cnt, hs / cnt / cfg.k, ns / cnt


def evaluation(
    cfg: LightGCNConfig,
    params: LightGCNParams,
    eval_graph: BipartiteGraph,
    eval_set: EvalSet,
    key: jax.Array,
    max_degree: int,
    eval_embeddings: str = "e0",
    prop_graph=None,
    mesh=None,
    num_valid_items: Optional[int] = None,
    metrics_prop_graph=None,
) -> Tuple[float, float, float, float]:
    """(loss, recall, precision, ndcg) — reference ``run_pipeline_lightgcn.py:20-73``.

    The eval LOSS propagates over the eval split's own adjacency
    (``prop_graph``), mirroring the reference's ``model.forward(
    val_sparse_edge_index)``. The ranking METRICS under
    ``eval_embeddings="final"`` propagate over ``metrics_prop_graph`` —
    callers pass the TRAIN adjacency (the LightGCN paper's scoring, and the
    leakage-free choice: the eval split's edges ARE the prediction targets,
    so they must not feed the scoring propagation)."""
    loss = float(
        eval_loss(cfg, params, eval_graph, eval_set, key, max_degree, prop_graph)
    )
    recall, precision, ndcg = get_metrics(
        params, cfg, eval_set,
        graph_for_final=(
            metrics_prop_graph if metrics_prop_graph is not None
            else (prop_graph if prop_graph is not None else eval_graph)
        ),
        eval_embeddings=eval_embeddings,
        mesh=mesh, num_valid_items=num_valid_items,
    )
    return loss, recall, precision, ndcg


def export_artifacts(
    params: LightGCNParams,
    data: LightGCNData,
    cfg: LightGCNConfig,
    artifact_dir: str,
    chunk: int = 1024,
    mesh=None,
) -> np.ndarray:
    """Top-``num_recommendations`` per user (positives excluded) + embedding
    tables — the matcher hand-off (reference ``run_pipeline_lightgcn.py:
    211-238``). Returns the [U, R] recommendation matrix and writes npz.

    With a model-sharded mesh the top-k sweep runs the distributed MIPS path
    over the (possibly pad-tailed) row-sharded item table; the saved tables
    are always sliced back to the true node counts.
    """
    os.makedirs(artifact_dir, exist_ok=True)
    eu, ei = data.all_edges
    from ..data.lightgcn_data import padded_user_items

    users = np.arange(data.num_users, dtype=np.int32)
    pos_items, pos_count = padded_user_items(users, eu.astype(np.int64), ei)
    out = np.zeros((data.num_users, cfg.num_recommendations), np.int32)

    use_sharded = mesh is not None and mesh.shape[MODEL_AXIS] > 1
    if use_sharded:
        from ..ops.topk import sharded_mips_topk

        k_rec = cfg.num_recommendations
        num_valid = data.num_items

        @jax.jit
        def topk_chunk(uvec, item_emb, ex, exc):
            _, idx = sharded_mips_topk(
                mesh, uvec, item_emb, k_rec, ex, exc,
                num_valid_items=num_valid,
            )
            return idx
    else:
        @partial(jax.jit, static_argnames=("k",))
        def _topk_chunk(uvec, item_emb, ex, exc, k):
            from ..ops.topk import auto_mips_topk

            _, idx = auto_mips_topk(uvec, item_emb, k, ex, exc)
            return idx

        topk_chunk = partial(_topk_chunk, k=cfg.num_recommendations)

    for s in range(0, data.num_users, chunk):
        e = min(s + chunk, data.num_users)
        pad = chunk - (e - s)
        uu = np.pad(users[s:e], (0, pad))
        ex = np.pad(pos_items[s:e], ((0, pad), (0, 0)), constant_values=-1)
        exc = np.pad(pos_count[s:e], (0, pad))
        idx = topk_chunk(
            params.user_emb[jnp.asarray(uu)], params.item_emb,
            jnp.asarray(ex), jnp.asarray(exc),
        )
        out[s:e] = np.asarray(idx)[: e - s]

    np.savez_compressed(
        os.path.join(artifact_dir, "lightgcn_output.npz"),
        recommendations=out,
    )
    np.savez_compressed(
        os.path.join(artifact_dir, "lightgcn_embeddings.npz"),
        users_emb_final=np.asarray(params.user_emb)[: data.num_users],
        items_emb_final=np.asarray(params.item_emb)[: data.num_items],
    )
    return out


def train(
    cfg: LightGCNConfig,
    data: LightGCNData,
    mesh=None,
    export: bool = True,
    eval_embeddings: str = "e0",
    log_fn=print,
) -> Stats:
    """Full training loop — reference ``run_pipeline_lightgcn.py:76-232``.

    ``mesh=None`` runs single-device (the reference's setting). With a
    multi-device mesh the run is the PRODUCTION multi-chip path: node counts
    pad up to divide the ``model`` axis, the E⁰ tables are row-sharded over
    it, propagation is the sharded shard_map SpMM, eval/export score through
    the distributed MIPS top-k, and the BPR minibatch splits over ``data``.
    Pad rows are dead weight — zero-initialized, never sampled, and masked
    out of every top-k by ``num_valid_items``.
    """
    cfg.print()
    if mesh is None:
        # honor cfg.mesh for launcher-driven runs: any multi-process launch
        # (jax.distributed already initialized by the CLI) or an explicit
        # non-default axis spec spans ALL devices; the single-device default
        # stays pinned to one chip (the reference's setting)
        mc = getattr(cfg, "mesh", None)
        explicit = mc is not None and (mc.data_axis, mc.model_axis) != (-1, 1)
        if jax.process_count() > 1 or explicit:
            mesh = build_mesh(mc.data_axis, mc.model_axis)
        else:
            mesh = build_mesh(1, 1, devices=[jax.devices()[0]])
    parts = mesh.shape[MODEL_AXIS]

    key = jax.random.PRNGKey(cfg.seed)
    key, k_init = jax.random.split(key)
    params = init_lightgcn(
        k_init, data.num_users, data.num_items, cfg.hidden_layer_size
    )
    # Pad node counts up to divide the model axis, then row-shard the tables
    # over it. The pad tail is appended AFTER init so the true rows match the
    # single-device run bit-for-bit (a padded init would re-key every row).
    from ..parallel.mesh import shard_rows_pad

    u_pad = shard_rows_pad(data.num_users, mesh)
    i_pad = shard_rows_pad(data.num_items, mesh)
    if parts > 1:
        params = LightGCNParams(
            user_emb=jax.device_put(
                jnp.pad(params.user_emb, ((0, u_pad - data.num_users), (0, 0))),
                row_sharding(mesh),
            ),
            item_emb=jax.device_put(
                jnp.pad(params.item_emb, ((0, i_pad - data.num_items), (0, 0))),
                row_sharding(mesh),
            ),
        )

    max_deg_train = int(np.asarray(data.train_graph.user_deg).max(initial=1))
    # one SHARED eval bound: max_degree is a static jit arg of the eval-loss
    # program, and a per-split value forces a recompile per split (~minutes
    # each through the remote compiler at H&M scale); the bound only needs
    # to be ≥ the split's true max, so the max over both is exact for both
    max_deg_eval = max(
        int(np.asarray(data.val_graph.user_deg).max(initial=1)),
        int(np.asarray(data.test_graph.user_deg).max(initial=1)),
    )
    max_deg_val = max_deg_test = max_deg_eval

    def prop_operand(g: BipartiteGraph):
        if parts > 1 and (u_pad != g.num_users or i_pad != g.num_items):
            # rebuild with pad-extended node counts (host-side, cheap); the
            # edge set — and therefore degrees/weights — is unchanged
            g = BipartiteGraph.from_edges(*g.edges_host(), u_pad, i_pad)
        return select_propagation(cfg, g, mesh)

    train_prop = prop_operand(data.train_graph)
    # val/test operands build lazily on first eval: each is ~1 min of host
    # plan construction + ~1 GB of device arrays at H&M scale, wasted when
    # eval_every is sparse
    _prop_cache: dict = {}

    def eval_prop(name: str, graph: BipartiteGraph):
        if name not in _prop_cache:
            _prop_cache[name] = prop_operand(graph)
        return _prop_cache[name]

    step_fn, tx = make_train_step(
        cfg, data.train_graph, max_deg_train, mesh=mesh, prop_graph=train_prop
    )
    opt_state = tx.init(params)

    # mid-run persistence + resume (SURVEY §5; the reference's 10k-iteration
    # runs have none — run_pipeline_lightgcn.py saves only final tables)
    ckpt_dir = os.path.join(cfg.artifact_dir, "lightgcn_ckpt")
    start_it = 0
    if cfg.resume:
        from .checkpoint import load_latest

        template = {"params": params, "opt_state": opt_state}
        state, ver = load_latest(ckpt_dir, template)
        if ver is not None:
            def _replace(x, t):
                sh = getattr(t, "sharding", None)
                if sh is not None and len(sh.device_set) > 1:
                    return jax.device_put(jnp.asarray(x), sh)
                if hasattr(x, "dtype"):
                    return jnp.asarray(np.asarray(x))
                return x

            state = jax.tree.map(_replace, state, template)
            params, opt_state = state["params"], state["opt_state"]
            start_it = ver + 1
            # decorrelated (not replayed) sampling stream after resume
            key = jax.random.fold_in(key, start_it)
            log_fn(f"| Resuming from checkpoint (iteration {start_it})...")

    def _all_finite(tree) -> bool:
        # ONE jitted global reduction over the float leaves; the snapshot
        # itself (params AND optimizer state — an inf Adam second moment
        # keeps params finite while zeroing every later update) must be
        # validated, not just the (pre-update) step loss — a poisoned
        # snapshot would corrupt last_good and every later rollback.
        # Jitted, not eager: per-leaf eager ops on multi-process sharded
        # arrays are each their own global computation and deadlock the
        # XLA CPU rendezvous when interleaved (see encdec_pipeline.
        # _finite_all, which this shares).
        from .encdec_pipeline import _finite_all

        return bool(_finite_all(tree))

    train_loss = jnp.zeros(())
    recall = precision = 0.0
    best_recall, best_params, last_evaled = -1.0, None, -1
    last_good = None  # (params, opt_state) at the last finite eval point
    for it in range(start_it, cfg.epochs):
        key, k_step = jax.random.split(key)
        params, opt_state, train_loss = step_fn(params, opt_state, k_step)

        if cfg.checkpoint_every and it % cfg.checkpoint_every == 0 and it > start_it:
            from .checkpoint import save_state

            # never persist a poisoned state: cfg.resume loads the NEWEST
            # checkpoint, so a NaN save would brick every resume attempt
            if np.isfinite(float(train_loss)) and _all_finite(
                (params, opt_state)
            ):
                save_state(
                    os.path.join(ckpt_dir, f"model_{it}"),
                    {"params": params, "opt_state": opt_state},
                    sharded=parts > 1,
                )
            else:
                log_fn(
                    f"| skipping checkpoint at iter {it}: non-finite state"
                )

        if it % cfg.eval_every == 0:
            # failure detection (SURVEY §5; the reference's runs die):
            # a non-finite loss rolls back to the last finite eval point
            # instead of letting NaNs poison the tables; the step key
            # stream has already advanced, so the retried steps resample
            if not np.isfinite(float(train_loss)) or not _all_finite(
                (params, opt_state)
            ):
                if last_good is None:
                    raise FloatingPointError(
                        f"non-finite loss {float(train_loss)} at iter {it} "
                        "before any finite eval point"
                    )
                # hand out COPIES: step_fn donates its inputs, and the
                # snapshot must survive repeated rollbacks
                params = jax.tree.map(jnp.copy, last_good[0])
                opt_state = jax.tree.map(jnp.copy, last_good[1])
                log_fn(
                    f"| non-finite loss at iter {it}: rolled back to the "
                    "last finite eval point"
                )
                continue
            last_good = (
                jax.tree.map(jnp.copy, params),
                jax.tree.map(jnp.copy, opt_state),
            )
            key, k_eval = jax.random.split(key)
            val_loss, recall, precision, ndcg = evaluation(
                cfg, params, data.val_graph, data.val_set, k_eval,
                max_deg_val, eval_embeddings,
                prop_graph=eval_prop("val", data.val_graph),
                mesh=mesh, num_valid_items=data.num_items,
                metrics_prop_graph=train_prop,
            )
            last_evaled = it
            if recall > best_recall:
                # step_fn donates the param buffers, so a live snapshot
                # needs a real device copy (sharding-preserving)
                snap = jax.tree.map(jnp.copy, params)
                best_recall, best_params = recall, (snap, precision)
            log_fn(
                f"[Iter {it}/{cfg.epochs}] train_loss: {float(train_loss):.5f}, "
                f"val_loss: {val_loss:.5f}, val_recall@{cfg.k}: {recall:.6f}, "
                f"val_precision@{cfg.k}: {precision:.6f}, val_ndcg@{cfg.k}: {ndcg:.6f}"
            )

    if cfg.select_best_val:
        if last_evaled != cfg.epochs - 1:  # last iterate never scored
            key, k_eval = jax.random.split(key)
            _, recall, precision, _ = evaluation(
                cfg, params, data.val_graph, data.val_set, k_eval,
                max_deg_val, eval_embeddings,
                prop_graph=eval_prop("val", data.val_graph),
                mesh=mesh, num_valid_items=data.num_items,
                metrics_prop_graph=train_prop,
            )
            if recall > best_recall:
                best_recall, best_params = recall, (params, precision)
        if best_params is not None and best_params[0] is not params:
            log_fn(
                f"| select_best_val: using checkpoint with val recall "
                f"{best_recall:.6f} (final iterate: {recall:.6f})"
            )
        if best_params is not None:
            params, precision = best_params[0], best_params[1]
            recall = best_recall

    key, k_test = jax.random.split(key)
    test_loss, test_recall, test_precision, test_ndcg = evaluation(
        cfg, params, data.test_graph, data.test_set, k_test,
        max_deg_test, eval_embeddings,
        prop_graph=eval_prop("test", data.test_graph),
        mesh=mesh, num_valid_items=data.num_items,
        metrics_prop_graph=train_prop,
    )
    log_fn(
        f"[test_loss: {test_loss:.5f}, test_recall@{cfg.k}: {test_recall:.5f}, "
        f"test_precision@{cfg.k}: {test_precision:.5f}, test_ndcg@{cfg.k}: {test_ndcg:.5f}]"
    )

    if export:
        if jax.process_count() > 1:
            # the npz artifact writer downloads full tables, which is not a
            # multi-host operation (shards are not process-addressable);
            # multi-host runs persist through the sharded orbax checkpoints
            log_fn("| skipping npz artifact export on a multi-process run")
        else:
            export_artifacts(params, data, cfg, cfg.artifact_dir, mesh=mesh)

    return Stats(
        loss=float(train_loss),
        recall_val=recall,
        recall_test=test_recall,
        precision_val=precision,
        precision_test=test_precision,
        params=params if getattr(cfg, "return_params", False) else None,
    )
