"""Decompose the encdec (hetero SAGE) device train step at the 200k-user
shape (VERDICT r4 item 3): the fused step runs 14.6 batches/s while the
sampler feeds 121.6 — nobody has shown whether the device step is near a
ceiling. Times each stage in isolation (embed lookups / conv aggregation /
dense-vs-segment path / decoder / loss / backward / optimizer) and merges
an ``encdec_step`` block into ROOFLINE.json.

Run on the real TPU: ``python profile_encdec_step.py``.
"""
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.data.link_pred_data import (
    create_link_pred_data,
    create_samplers,
)
from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph
from laplace_gnn_recommendation_tpu.models import sage
from laplace_gnn_recommendation_tpu.train.encdec_pipeline import make_train_step

NUM_USERS, NUM_ITEMS, AVG_DEG = 200_000, 50_000, 16
BATCH = 256
REPS = 20

# Round-5 re-measurement findings, recorded with the stage table (see
# bench_conv_agg.py and the /tmp prototypes it summarizes).
ANALYSIS = (
    "Re-profiled on an uncontended relay: full step 25.5 ms = 39.2 "
    "batches/s = 10,046 users/s at the probed 200k shape - 2.6x the "
    "device rate in the round-4 BENCH_ENCDEC (15.1 b/s), which was "
    "measured under relay congestion; the earlier 28 ms agg-pair stage "
    "and 4.4k users/s were congestion artifacts (stage rows here still "
    "carry cross-block jitter: fwd_bwd can exceed full_step). The conv "
    "aggregation is GATHER-engine-bound, not scatter-bound: with chained "
    "dependencies a single [148k]-row gather from the [31872,64] f32 "
    "table costs 2.9 ms (~50M rows/s, the engine's fixed row rate; bf16 "
    "rows are no faster at this table size), while the dst-sorted "
    "cumsum-diff segment sum ties the production segment_sum form at "
    "3.1 ms because both pay the same per-edge gather - the cumsum "
    "itself is 0.04 ms (these batch arrays live in VMEM S(1) at TB/s). "
    "Measured dead end: the double-one-hot blocked SpMM (chunk adjacency "
    "= onehot_dst @ onehot_src on the MXU, contracted against a "
    "VMEM-resident src-slice window, eliminating the per-edge gather) "
    "costs 3.7-5.5 ms for the MXU core alone: at R_c=8 the per-slice dst "
    "degrees (~1) collapse chunk fill to 0.08, and at R_c=E_c=128 "
    "one-hot materialization + scan-step overhead cap it at 10-17 eff "
    "TFLOP/s - not competitive with the 4.1 ms gather+segsum it would "
    "replace. XLA already overlaps the two directions' independent "
    "gathers (the pair measures 1.8 ms vs 2x2.9 serialized). At 39 b/s "
    "the device consumes ~1/3 of the 2-worker sampler feed (121 b/s): "
    "DP scaling is feed-limited, not device-limited."
)


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timed(label, fn, *args, reps=REPS):
    out = fn(*args)
    _sync(out)
    # 3 windows, min: these stages are tens of ms — relay weather moves
    # single-window numbers ±50% (observed fwd-only > fwd+bwd); the min
    # window measures the machine
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        dts.append((time.perf_counter() - t0) / reps)
    dt = min(dts)
    print(f"{label:44s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    g = random_hetero_graph(
        seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS, avg_degree=AVG_DEG,
        num_user_features=2, num_item_features=2, feature_cardinality=64,
    )
    cfg = Config(
        batch_size=BATCH, num_neighbors=24, n_hop_neighbors=2, k=12,
        candidate_pool_size=20, hidden_layer_size=64,
        encoder_layer_output_size=32, learning_rate=1e-3,
        budget_probe=8,
    )
    data = create_link_pred_data(g, cfg)
    train_s, _, _ = create_samplers(cfg, data, seed=0)

    feature_info = sage.get_feature_info(data.graph)
    params, bn_state = sage.init_sage_params(
        jax.random.PRNGKey(0), cfg, feature_info, float_dims=data.float_dims()
    )
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    b = train_s.sample_batch(rng.integers(0, NUM_USERS, BATCH))
    nu, ni, e = len(b.user_ids), len(b.item_ids), len(b.edge_src)
    dense_bytes = 2 * nu * ni * 4
    use_dense = cfg.conv_agg_type in ("add", "mean") and (
        0 < dense_bytes <= (cfg.dense_bytes_budget or 0)
    )
    shapes = {
        "user_slots": nu, "item_slots": ni, "edge_slots": e,
        "label_grid": list(np.asarray(b.label_src).shape),
        "subgraph_dense_path": bool(use_dense),
        "subgraph_dense_bytes": int(dense_bytes),
    }
    print(shapes, flush=True)

    uf, itf = data.user_features, data.item_features
    uff, iff = data.user_features_float, data.item_features_float
    key = jax.random.PRNGKey(1)

    stages = {}

    # --- full train step (the production fused step) ---
    step = make_train_step(cfg, data, tx)
    full = lambda p, bn, o, bb, k: step(p, bn, o, bb, k)
    # keep state fixed across reps: re-donate copies each call would skew —
    # run the donated step once for compile, then time a non-donating twin
    @jax.jit
    def step_nodonate(p, bn, o, bb, k):
        def loss_fn(pp):
            logits, new_bn = sage.forward(
                pp, bn, bb, uf, itf, cfg, train=True, rng=k,
                user_features_float=uff, item_features_float=iff,
            )
            return sage.bce_loss(logits, bb), new_bn
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, o2 = tx.update(grads, o)
        return optax.apply_updates(p, updates), new_bn, o2, loss

    stages["full_step"] = timed(
        "full train step", step_nodonate, params, bn_state, opt_state, b, key
    )

    # --- forward+backward, no optimizer ---
    @jax.jit
    def fwd_bwd(p, bn, bb, k):
        def loss_fn(pp):
            logits, new_bn = sage.forward(
                pp, bn, bb, uf, itf, cfg, train=True, rng=k,
                user_features_float=uff, item_features_float=iff,
            )
            return sage.bce_loss(logits, bb), new_bn
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        return loss, grads

    stages["fwd_bwd"] = timed("fwd+bwd (no optimizer)", fwd_bwd, params, bn_state, b, key)

    # --- forward only ---
    @jax.jit
    def fwd_only(p, bn, bb, k):
        logits, _ = sage.forward(
            p, bn, bb, uf, itf, cfg, train=True, rng=k,
            user_features_float=uff, item_features_float=iff,
        )
        return sage.bce_loss(logits, bb)

    stages["fwd_only"] = timed("forward only", fwd_only, params, bn_state, b, key)

    # --- encode only ---
    @jax.jit
    def enc_only(p, bn, bb, k):
        z_u, z_i, _ = sage.encode(
            p, bn, bb, uf, itf, cfg, train=True, rng=k,
            user_features_float=uff, item_features_float=iff,
        )
        return jnp.sum(z_u) + jnp.sum(z_i)

    stages["encode_fwd"] = timed("encode only (fwd)", enc_only, params, bn_state, b, key)

    # --- embed only (feature table lookups + renorm + concat) ---
    @jax.jit
    def embed_only(p, bb):
        from laplace_gnn_recommendation_tpu.constants import NODE_ITEM, NODE_USER

        xu = sage._embed_features(p["embeddings"][NODE_USER], uf[bb.user_ids])
        xi = sage._embed_features(p["embeddings"][NODE_ITEM], itf[bb.item_ids])
        return jnp.sum(xu) + jnp.sum(xi)

    stages["embed_fwd"] = timed("embed lookups only", embed_only, params, b)

    # --- one conv-layer aggregation pair on hidden-width inputs ---
    xi0 = jnp.asarray(rng.normal(size=(ni, cfg.hidden_layer_size)).astype(np.float32))
    xu0 = jnp.asarray(rng.normal(size=(nu, cfg.hidden_layer_size)).astype(np.float32))

    @jax.jit
    def agg_pair_segment(bb, xu_, xi_):
        emask = bb.edge_mask
        msgs_u = jnp.where(emask[:, None], xi_[bb.edge_dst], 0.0)
        agg_u = jax.ops.segment_sum(msgs_u, bb.edge_src, num_segments=nu)
        msgs_i = jnp.where(emask[:, None], xu_[bb.edge_src], 0.0)
        agg_i = jax.ops.segment_sum(msgs_i, bb.edge_dst, num_segments=ni)
        return jnp.sum(agg_u) + jnp.sum(agg_i)

    stages["agg_pair_segment"] = timed(
        "conv agg pair (segment path)", agg_pair_segment, b, xu0, xi0
    )

    @jax.jit
    def agg_pair_dense(bb, xu_, xi_):
        adj = jnp.zeros((nu, ni), jnp.float32)
        adj = adj.at[bb.edge_src, bb.edge_dst].add(bb.edge_mask.astype(jnp.float32))
        agg_u = jnp.dot(adj, xi_, preferred_element_type=jnp.float32)
        agg_i = jnp.einsum("ui,ud->id", adj, xu_, preferred_element_type=jnp.float32)
        return jnp.sum(agg_u) + jnp.sum(agg_i)

    if dense_bytes <= (2 << 30):
        stages["agg_pair_dense"] = timed(
            "conv agg pair (dense adj build+2 matmuls)", agg_pair_dense, b, xu0, xi0
        )

    # --- decoder on precomputed z ---
    z_u, z_i, _ = jax.jit(
        lambda p, bn, bb, k: sage.encode(
            p, bn, bb, uf, itf, cfg, train=True, rng=k,
            user_features_float=uff, item_features_float=iff,
        )
    )(params, bn_state, b, key)
    z_u, z_i = jax.block_until_ready((z_u, z_i))

    @jax.jit
    def dec_only(p, zu, zi, bb, k):
        return jnp.sum(sage.decode(p, zu, zi, bb, cfg, train=True, rng=k))

    stages["decode_fwd"] = timed("decoder only (fwd)", dec_only, params, z_u, z_i, b, key)

    # --- optimizer only ---
    _, grads0 = jax.jit(
        lambda p, bn, bb, k: fwd_bwd(p, bn, bb, k)
    )(params, bn_state, b, key)
    grads0 = jax.block_until_ready(grads0)

    @jax.jit
    def opt_only(p, o, gr):
        updates, o2 = tx.update(gr, o)
        return optax.apply_updates(p, updates)

    stages["optimizer"] = timed("optimizer (adam update+apply)", opt_only, params, opt_state, grads0)

    batches_per_s = 1.0 / stages["full_step"]
    users_per_s = BATCH * batches_per_s
    print(f"\nfull step: {batches_per_s:.2f} batches/s = {users_per_s:.0f} users/s")

    # merge into ROOFLINE.json
    roofline = {}
    if os.path.exists("ROOFLINE.json"):
        try:
            with open("ROOFLINE.json") as f:
                roofline = json.load(f)
        except (json.JSONDecodeError, OSError):
            roofline = {}
    roofline["encdec_step"] = {
        "shape": shapes,
        "per_stage_ms": {k: round(v * 1e3, 2) for k, v in stages.items()},
        "batches_per_sec": round(batches_per_s, 2),
        "users_per_sec": round(users_per_s, 1),
        "analysis": ANALYSIS,
    }
    with open("ROOFLINE.json.tmp", "w") as f:
        json.dump(roofline, f, indent=1)
    os.replace("ROOFLINE.json.tmp", "ROOFLINE.json")
    print("ROOFLINE.json updated")


if __name__ == "__main__":
    main()
