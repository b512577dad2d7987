"""H&M-scale end-to-end benchmark (VERDICT r1 item 2).

Builds a synthetic graph with the H&M dataset's shape — 1.37M customers ×
105k articles × ~30M transactions (the scale implied by
``/root/reference/run_preprocessing_fashion.py:22-286``) — and runs the
PUBLIC pipeline on one chip:

* ``lightgcn_pipeline.train()`` end-to-end (auto-selects the blocked
  one-hot-matmul SpMM — the dense path needs 288 GB at this shape), with
  capped-eval metric sweeps,
* a pure step-timing loop for the exact propagated-edges/s/chip number,
* ``RetrievalServer.recommend`` over the 105k catalog for serving users/s,
* peak HBM from the device allocator.

Writes ``BENCH_HM.json`` with every number and prints ONE JSON line in the
driver's format. ``vs_baseline`` is a conservative LOWER bound: the torch-CPU
baseline cost is extrapolated from one measured forward direction as
``forward × K × 2`` — backward + Adam (which the TPU number includes) are
counted as FREE for the baseline.
"""
import json
import time

import numpy as np

NUM_USERS = 1_371_980   # H&M customers.parquet cardinality
NUM_ITEMS = 104_547     # H&M articles.parquet cardinality
AVG_DEGREE = 23.0       # ≈30M raw transactions, ~24M after (u,i) dedup
DIM = 32
K = 4
BATCH = 2048
TPU_STEPS = 10


def build_data():
    from laplace_gnn_recommendation_tpu.data.lightgcn_data import (
        create_lightgcn_data,
    )
    from laplace_gnn_recommendation_tpu.data.synthetic import (
        random_bipartite_edges,
    )

    import os

    t0 = time.perf_counter()
    cache = f"/tmp/hm_edges_{NUM_USERS}_{NUM_ITEMS}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        eu, ei = z["eu"], z["ei"]
    else:
        eu, ei = random_bipartite_edges(
            seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS,
            avg_degree=AVG_DEGREE, popularity_alpha=0.8,
        )
        np.savez(cache, eu=eu, ei=ei)
    data = create_lightgcn_data(eu, ei, NUM_USERS, NUM_ITEMS)
    return data, len(eu), time.perf_counter() - t0


def peak_hbm_bytes():
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats.get("peak_bytes_in_use", 0))
    except Exception:
        return -1


def bench_train(data):
    """Public train() end-to-end, then an exact step-rate window."""
    import jax

    from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
    from laplace_gnn_recommendation_tpu.models.lightgcn import init_lightgcn
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
        make_train_step,
        select_propagation,
        train,
    )

    cfg = LightGCNConfig(
        hidden_layer_size=DIM, num_iterations=K, batch_size=BATCH,
        epochs=20, eval_every=20, eval_user_cap=20_000, Lambda=1e-6,
        propagation="auto", dense_bytes_budget=4 << 30,  # 288 GB needed → blocked
    )
    t0 = time.perf_counter()
    stats = train(cfg, data, export=False, eval_embeddings="e0")
    wall = time.perf_counter() - t0

    # exact step rate (no eval in the window)
    g = data.train_graph
    max_deg = int(np.asarray(g.user_deg).max())
    params = init_lightgcn(jax.random.PRNGKey(0), NUM_USERS, NUM_ITEMS, DIM)
    prop = select_propagation(cfg, g, None)
    step, tx = make_train_step(cfg, g, max_deg, prop_graph=prop)
    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(1), TPU_STEPS + 2)
    params, opt_state, loss = step(params, opt_state, keys[0])
    float(loss)  # compile + completion barrier (scalar D2H)
    t0 = time.perf_counter()
    for i in range(TPU_STEPS):
        params, opt_state, loss = step(params, opt_state, keys[i + 1])
    float(loss)
    dt = time.perf_counter() - t0
    edges_per_step = g.num_edges * K * 2
    return stats, wall, edges_per_step * TPU_STEPS / dt, type(prop).__name__


def bench_serving():
    """Retrieval users/s over the 105k catalog (shape-bound)."""
    from laplace_gnn_recommendation_tpu.serving import RetrievalServer

    rng = np.random.default_rng(0)
    user_emb = rng.normal(size=(NUM_USERS, DIM)).astype(np.float32)
    item_emb = rng.normal(size=(NUM_ITEMS, DIM)).astype(np.float32)
    server = RetrievalServer(user_emb, item_emb, k=12, batch_size=256)
    server.recommend(np.arange(256))  # compile
    n = 4096
    ids = rng.integers(0, NUM_USERS, n)
    t0 = time.perf_counter()
    items, _ = server.recommend(ids)
    dt = time.perf_counter() - t0
    assert items.shape == (n, 12)
    return n / dt


def bench_cpu_forward(data):
    """One measured torch-CPU forward direction; step cost extrapolated as
    forward × K × 2 (backward/Adam counted as free — flatters the baseline)."""
    import torch as t

    eu, ei = data.train_edges
    e = len(eu)
    src = t.from_numpy(np.asarray(eu, np.int64))
    dst = t.from_numpy(np.asarray(ei, np.int64))
    w = t.rand(e)
    item_emb = t.randn(data.num_items, DIM)
    t0 = time.perf_counter()
    t.zeros((data.num_users, DIM)).index_add_(0, src, w[:, None] * item_emb[dst])
    fwd = time.perf_counter() - t0
    return e / fwd  # edge-messages/s; step edges/s is identical by linearity


def main():
    data, raw_edges, build_s = build_data()
    train_edges = data.train_graph.num_edges
    stats, wall, tpu_eps, prop_kind = bench_train(data)
    hbm = peak_hbm_bytes()
    users_per_s = bench_serving()
    try:
        cpu_eps = bench_cpu_forward(data)
        vs = tpu_eps / cpu_eps
    except Exception:
        cpu_eps, vs = float("nan"), float("nan")

    payload = {
        "scale": {
            "num_users": NUM_USERS, "num_items": NUM_ITEMS,
            "train_edges": int(train_edges), "total_edges": int(raw_edges),
        },
        "data_build_s": round(build_s, 1),
        "train": {
            "propagation": prop_kind,
            "epochs": 20,
            "end_to_end_wall_s": round(wall, 1),
            "edges_per_sec_per_chip": round(tpu_eps, 1),
            "final_loss": stats.loss,
            "val_recall@12_cap20k": stats.recall_val,
            "test_recall@12_cap20k": stats.recall_test,
        },
        "peak_hbm_bytes": hbm,
        "serving_users_per_sec": round(users_per_s, 1),
        "torch_cpu_edges_per_sec_forward_extrapolated": round(cpu_eps, 1),
        "vs_baseline_lower_bound": round(vs, 2),
    }
    with open("BENCH_HM.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "hm_scale_train_edges_per_sec_per_chip",
                "value": round(tpu_eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
