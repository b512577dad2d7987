"""H&M-scale end-to-end benchmark (VERDICT r1 item 2; r2 items 1/5/6).

Builds a synthetic CLUSTERED graph with the H&M dataset's shape — 1.37M
customers × 105k articles × ~30M transactions (the scale implied by
``/root/reference/run_preprocessing_fashion.py:22-286``), with recoverable
latent structure (``latent_bipartite_edges``) so the run can prove LEARNING,
not just throughput — and runs the PUBLIC pipeline on one chip:

* **Convergence tier** (``lightgcn_pipeline.train()``): ``CONV_STEPS``
  optimizer steps at batch 32k with staircase LR decay — the budgeted
  version of the reference's 10,000-iteration default
  (``/root/reference/config.py:139``, ``run_pipeline_lightgcn.py:118-159``).
  Reports the loss curve, capped-eval recall@12, and the popularity-only
  baseline through the SAME metric machinery (done = loss ≪ ln 2 and
  recall ≥ 1.5× popularity).
* a pure step-timing loop for the exact propagated-edges/s/chip number,
* one FULL uncapped 1.37M-user eval sweep (wall + users/s) — then the cap
  is a choice, not a blind spot,
* ``RetrievalServer.recommend`` over the 105k catalog for serving users/s,
* peak HBM from the device allocator (error reported, not swallowed).

``vs_baseline``: measured against the faithful torch-CPU port of the
reference's own train iteration (``bench.bench_torch_cpu`` — homogeneous
sparse adjacency, gcn_norm recomputed per forward, sparse.mm, backward,
Adam) run for ``--torch-steps`` real steps at this exact scale (no
extrapolation). Writes ``BENCH_HM.json`` and prints ONE JSON line.
"""
import argparse
import json
import re
import time

import numpy as np

NUM_USERS = 1_371_980   # H&M customers.parquet cardinality
NUM_ITEMS = 104_547     # H&M articles.parquet cardinality
AVG_DEGREE = 23.0       # ≈30M raw transactions, ~24M after (u,i) dedup
NUM_CLUSTERS = 200      # latent structure: ~520 articles per style cluster
DIM = 32
K = 4       # overridable via --k-iters (HPO winner adoption)
LR = 1e-2   # overridable via --lr
LAMBDA = 1e-6  # overridable via --lam
BATCH = 32_768
CONV_STEPS = 1000
EVAL_EVERY = 25  # fine-grained best-val selection: the BPR peak is narrow
# (HPO_HM.json: 25-step cadence catches it, 50-step cadence undershot ~30%)
EVAL_CAP = 20_000
TPU_STEPS = 10


def build_data():
    from laplace_gnn_recommendation_tpu.data.lightgcn_data import (
        create_lightgcn_data,
    )
    from laplace_gnn_recommendation_tpu.data.synthetic import (
        latent_bipartite_edges,
    )

    import os

    t0 = time.perf_counter()
    cache = f"/tmp/hm_clustered_{NUM_USERS}_{NUM_ITEMS}_{NUM_CLUSTERS}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        eu, ei = z["eu"], z["ei"]
    else:
        eu, ei, _, _ = latent_bipartite_edges(
            seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS,
            avg_degree=AVG_DEGREE, num_clusters=NUM_CLUSTERS,
            in_cluster_p=0.85, popularity_alpha=0.8,
        )
        np.savez(cache, eu=eu, ei=ei)
    data = create_lightgcn_data(eu, ei, NUM_USERS, NUM_ITEMS)
    return data, eu, ei, time.perf_counter() - t0


def peak_hbm_bytes():
    """Allocator peak if the runtime exposes it; otherwise the live-array
    resident total (honest lower bound — excludes jit-internal transients,
    which XLA sizes at compile time). The axon relay device returns None
    from ``memory_stats()``, so the fallback is the shipping path here."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return int(stats.get("peak_bytes_in_use", -1)), "allocator_peak", None
        resident = sum(a.nbytes for a in jax.live_arrays())
        return int(resident), "live_arrays_resident", (
            "memory_stats() empty on this device; value is the resident "
            "live-array total at end of training (lower bound on peak)"
        )
    except Exception as exc:
        return -1, "unavailable", f"{type(exc).__name__}: {exc}"


def make_cfg(**kw):
    from laplace_gnn_recommendation_tpu.configs import LightGCNConfig

    # Schedule SHAPE mirrors the reference default (×0.95 staircase, ~100
    # decays over the run — config.py:139's 10k iters / decay-every-100)
    # compressed into the CONV_STEPS budget (67 decays → final lr ×0.03).
    # λ stays 1e-6: bpr_loss MEAN-normalises the pairwise term, so paper-
    # units λ_eff ≈ λ·B — at batch 32k, λ=1e-4 is λ_eff≈3 and pins recall
    # to the random floor (measured), while 1e-6 learns. The measured
    # failure mode at constant lr (peak at ~step 100, then steady decay of
    # val recall) is handled by the anneal + best-val model selection.
    base = dict(
        hidden_layer_size=DIM, num_iterations=K, batch_size=BATCH,
        epochs=CONV_STEPS, eval_every=EVAL_EVERY,
        lr_decay_every=max(1, CONV_STEPS // 67),
        learning_rate=LR, eval_user_cap=EVAL_CAP, Lambda=LAMBDA,
        select_best_val=True,
        propagation="auto", dense_bytes_budget=4 << 30,  # 288 GB → blocked
    )
    base.update(kw)
    return LightGCNConfig(**base)


def popularity_params(data):
    """Constant user vectors × per-item popularity scores reproduce the
    'recommend the most popular unseen items' ranker exactly through the
    SAME metric machinery (train-item exclusion included)."""
    import jax.numpy as jnp

    from laplace_gnn_recommendation_tpu.models.lightgcn import LightGCNParams

    pop = np.bincount(
        np.asarray(data.train_edges[1]), minlength=NUM_ITEMS
    ).astype(np.float32)
    return LightGCNParams(
        user_emb=jnp.ones((NUM_USERS, 1), jnp.float32),
        item_emb=jnp.asarray(pop[:, None]),
    )


def popularity_recall(cfg, data):
    """Popularity-only baseline at the capped-eval tier."""
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
        get_metrics,
    )

    r, _, _ = get_metrics(
        popularity_params(data), cfg, data.test_set, eval_embeddings="e0"
    )
    return float(r)


def bench_steprate(data):
    """Exact step-rate window (no eval) on throwaway params. Runs BEFORE
    the convergence tier so its propagation operand + optimizer state are
    freed before train() builds its own (the peak-HBM probe reports the
    training run, not both resident at once)."""
    import jax

    from laplace_gnn_recommendation_tpu.models.lightgcn import init_lightgcn
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
        make_train_step,
        select_propagation,
    )

    cfg = make_cfg()
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
    return edges_per_step * TPU_STEPS / dt, type(prop).__name__


EVAL_EMB = "final"  # LightGCN-paper scoring (propagated embeddings over the
# TRAIN adjacency — leakage-free; see lightgcn_pipeline.evaluation). The
# committed HPO study (HPO_HM.json) measures this choice against the
# reference's raw-E⁰ scoring quirk.


def bench_train(data):
    """Public train() convergence run; returns the TRAINED (best-val
    selected) params via Stats.params for the eval sweep + serving tiers."""
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import train

    cfg = make_cfg(return_params=True)
    log_lines = []

    def log_fn(msg):
        print(msg, flush=True)
        log_lines.append(str(msg))

    t0 = time.perf_counter()
    stats = train(
        cfg, data, export=False, eval_embeddings=EVAL_EMB, log_fn=log_fn
    )
    wall = time.perf_counter() - t0
    assert stats.params is not None

    # loss curve from the eval-step log lines
    curve = []
    for line in log_lines:
        m = re.search(r"\[Iter (\d+)/\d+\] train_loss: ([\d.eE+-]+)", line)
        if m:
            curve.append({"step": int(m.group(1)), "loss": float(m.group(2))})
    return stats, wall, curve, cfg


def full_eval_sweep(cfg, params, data):
    """One UNCAPPED metric pass over every eval user (VERDICT r2 item 5).

    Scores in the same embedding space as the convergence tier
    (``EVAL_EMB``); final-embedding scoring propagates over the TRAIN
    adjacency (leakage-free — the test edges are the targets)."""
    import dataclasses

    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
        get_metrics, select_propagation,
    )

    cfg_full = dataclasses.replace(cfg, eval_user_cap=None)
    train_prop = (
        select_propagation(cfg_full, data.train_graph, None)
        if EVAL_EMB == "final" else None
    )
    serving_params = params
    if train_prop is not None:
        # production serving rides the same space: precomputed propagated
        # tables behind the MIPS retrieval server. The ONE forward here
        # also feeds the metric sweep below (scoring propagated tables
        # with eval_embeddings="e0" ≡ the "final" path, minus a second
        # K-iteration propagation)
        from laplace_gnn_recommendation_tpu.models.lightgcn import (
            LightGCNParams,
        )
        from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
            _forward_jit,
        )

        uf, _, itf, _ = _forward_jit(
            params, train_prop, num_iterations=cfg.num_iterations
        )
        serving_params = LightGCNParams(user_emb=uf, item_emb=itf)
    n_users = len(data.test_set.users)
    t0 = time.perf_counter()
    recall, precision, ndcg = get_metrics(
        serving_params, cfg_full, data.test_set, eval_embeddings="e0",
        chunk=8192
    )
    wall = time.perf_counter() - t0
    # calibration: the popularity baseline at the SAME uncapped tier, so the
    # headline quality number carries its yardstick (VERDICT r3 weak #4)
    pop_recall, _, _ = get_metrics(
        popularity_params(data), cfg_full, data.test_set,
        eval_embeddings="e0", chunk=8192,
    )
    return {
        "eval_users": int(n_users),
        "wall_s": round(wall, 1),
        "users_per_sec": round(n_users / wall, 1),
        "recall@12": recall,
        "precision@12": precision,
        "ndcg@12": ndcg,
        "eval_embeddings": EVAL_EMB,
        "popularity_recall@12": pop_recall,
        "recall_vs_popularity": (
            round(recall / pop_recall, 2) if pop_recall else None
        ),
    }, serving_params


def bench_serving(params=None):
    """Retrieval users/s over the 105k catalog. Serves the TRAINED tables
    when given (same E⁰ space the convergence tier evaluates in); random
    same-shape tables otherwise (throughput is shape-bound either way)."""
    from laplace_gnn_recommendation_tpu.serving import RetrievalServer

    rng = np.random.default_rng(0)
    if params is not None:
        user_emb = np.asarray(params.user_emb, np.float32)[:NUM_USERS]
        item_emb = np.asarray(params.item_emb, np.float32)[:NUM_ITEMS]
    else:
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


def bench_cpu_measured(eu, ei, steps):
    """MEASURED torch-CPU steps of the reference's faithful port at this
    exact scale (replaces the round-2 forward-only extrapolation)."""
    from bench import bench_torch_cpu

    return bench_torch_cpu(eu, ei, NUM_USERS, NUM_ITEMS, steps=steps,
                           batch=BATCH)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch-steps", type=int, default=3,
                    help="measured torch-CPU baseline steps, median-timed "
                         "(0 = skip; each step is minutes at this scale)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override CONV_STEPS (wall-budget knob)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--lam", type=float, default=None)
    ap.add_argument("--k-iters", type=int, default=None)
    args = ap.parse_args()
    global CONV_STEPS, LR, LAMBDA, K
    if args.steps:
        CONV_STEPS = args.steps
    if args.lr:
        LR = args.lr
    if args.lam:
        LAMBDA = args.lam
    if args.k_iters:
        K = args.k_iters

    data, eu, ei, build_s = build_data()
    train_edges = data.train_graph.num_edges
    tpu_eps, prop_kind = bench_steprate(data)
    stats, wall, curve, cfg = bench_train(data)
    hbm, hbm_kind, hbm_err = peak_hbm_bytes()
    pop_recall = popularity_recall(cfg, data)
    sweep, serving_params = full_eval_sweep(cfg, stats.params, data)
    users_per_s = bench_serving(serving_params)

    cpu_eps = None
    if args.torch_steps > 0:
        try:
            cpu_eps = bench_cpu_measured(eu, ei, args.torch_steps)
        except Exception as exc:
            print(f"torch baseline failed: {exc}")
    vs = tpu_eps / cpu_eps if cpu_eps else float("nan")

    payload = {
        "scale": {
            "num_users": NUM_USERS, "num_items": NUM_ITEMS,
            "num_clusters": NUM_CLUSTERS,
            "train_edges": int(train_edges), "total_edges": int(len(eu)),
        },
        "data_build_s": round(build_s, 1),
        "train": {
            "propagation": prop_kind,
            "eval_embeddings": EVAL_EMB,
            "steps": CONV_STEPS,
            "batch_size": BATCH,
            "end_to_end_wall_s": round(wall, 1),
            "edges_per_sec_per_chip": round(tpu_eps, 1),
            "loss_curve": curve,
            "final_loss": stats.loss,
            "val_recall@12_cap20k": stats.recall_val,
            "test_recall@12_cap20k": stats.recall_test,
            "popularity_recall@12_cap20k": pop_recall,
            "recall_vs_popularity": (
                round(stats.recall_test / pop_recall, 2) if pop_recall else None
            ),
        },
        "full_eval_sweep": sweep,
        "peak_hbm_bytes": hbm,
        "peak_hbm_kind": hbm_kind,
        **({"peak_hbm_note": hbm_err} if hbm_err else {}),
        "serving_users_per_sec": round(users_per_s, 1),
        "torch_cpu_edges_per_sec_measured": (
            round(cpu_eps, 1) if cpu_eps else None
        ),
        "torch_cpu_steps_measured": args.torch_steps,
        "vs_baseline_measured": round(vs, 2) if cpu_eps else None,
    }
    with open("BENCH_HM.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(
        json.dumps(
            {
                "metric": "hm_scale_train_edges_per_sec_per_chip",
                "value": round(tpu_eps, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 3) if cpu_eps else None,
            }
        )
    )


if __name__ == "__main__":
    main()
