"""Hetero SAGE ranking stack at scale (VERDICT r2 item 4).

Runs the PUBLIC encoder-decoder components — native sampler → fused train
step → native-assembly eval — on a 200k-user × 50k-item graph (the
reference's ranking stack never ran past ML-1M toys; its H&M config implies
this class of scale, ``run_preprocessing_fashion.py:22-286``).

Prints one JSON line with:
* train users/s and subgraph edges/s through sampler+step (prefetch
  overlapped, like ``run_pipeline``'s loop),
* eval users/s through the native eval assembly + ``infer``,
* the DP saturation ratio: sampler-only batches/s ÷ device-step-only
  batches/s — how many data-parallel step streams ONE host sampling thread
  can feed (VERDICT r2 weak #7's missing number).
"""
import json
import os
import time

import numpy as np

NUM_USERS, NUM_ITEMS, AVG_DEG = 200_000, 50_000, 16
BATCH = 256


def main():
    import jax

    from laplace_gnn_recommendation_tpu.configs import Config
    from laplace_gnn_recommendation_tpu.data.link_pred_data import (
        create_link_pred_data, create_samplers,
    )
    from laplace_gnn_recommendation_tpu.data.prefetch import prefetch
    from laplace_gnn_recommendation_tpu.data.synthetic import random_hetero_graph
    from laplace_gnn_recommendation_tpu.train.encdec_pipeline import (
        make_eval_step, make_train_step,
    )
    from laplace_gnn_recommendation_tpu.models import sage
    import optax

    t0 = time.perf_counter()
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
    train_s, _, test_s = create_samplers(cfg, data, seed=0)
    build_s = time.perf_counter() - t0

    feature_info = sage.get_feature_info(data.graph)
    params, bn_state = sage.init_sage_params(
        jax.random.PRNGKey(0), cfg, feature_info, float_dims=data.float_dims()
    )
    tx = optax.adam(cfg.learning_rate)
    opt_state = tx.init(params)
    step = make_train_step(cfg, data, tx)
    eval_step = make_eval_step(cfg, data)
    key = jax.random.PRNGKey(1)

    # --- sampler-only rate (host) -------------------------------------------
    rng = np.random.default_rng(0)
    train_s.sample_batch(rng.integers(0, NUM_USERS, BATCH))  # warm caches
    t0 = time.perf_counter()
    n_s = 30
    edges = 0
    for _ in range(n_s):
        b = train_s.sample_batch(rng.integers(0, NUM_USERS, BATCH))
        edges += int(np.asarray(b.edge_mask).sum())
    sampler_bps = n_s / (time.perf_counter() - t0)
    edges_per_batch = edges / n_s

    # --- parallel feed scaling curve (VERDICT r3 task 7) --------------------
    # W ∈ {1,2,4,8} threads; wall AND process-CPU time per point verify the
    # C++ assembly's GIL release actually overlaps (cpu/wall ≈ min(W, cores)
    # when it does). Host core count is recorded — this container has 2.
    from laplace_gnn_recommendation_tpu.data.sampler import (
        parallel_epoch_batches,
    )

    worker_curve = {}
    for w in (1, 2, 4, 8):
        par_it = parallel_epoch_batches(train_s, num_workers=w, shuffle=True)
        next(par_it)  # warm worker clones
        t0, c0 = time.perf_counter(), time.process_time()
        n_p = 0
        for b in par_it:
            n_p += 1
            if n_p == n_s:
                break
        wall = max(time.perf_counter() - t0, 1e-9)
        cpu = time.process_time() - c0
        par_it.close()  # release workers (finally-block cancellation)
        worker_curve[str(w)] = {
            "batches_per_sec": round(n_p / wall, 2),
            "cpu_over_wall": round(cpu / wall, 2),
        }
    par_bps = worker_curve["2"]["batches_per_sec"]

    # --- device-step-only rate (one batch, repeated) ------------------------
    b0 = train_s.sample_batch(rng.integers(0, NUM_USERS, BATCH))
    key, k0 = jax.random.split(key)
    params, bn_state, opt_state, loss = step(params, bn_state, opt_state, b0, k0)
    float(loss)  # compile + completion barrier
    t0 = time.perf_counter()
    n_d = 30
    for i in range(n_d):
        key, ki = jax.random.split(key)
        params, bn_state, opt_state, loss = step(
            params, bn_state, opt_state, b0, ki
        )
    float(loss)
    step_bps = n_d / (time.perf_counter() - t0)

    # --- overlapped end-to-end train loop (the run_pipeline shape) ----------
    def batches(n):
        for _ in range(n):
            yield train_s.sample_batch(rng.integers(0, NUM_USERS, BATCH))

    n_e = 30
    t0 = time.perf_counter()
    for b in prefetch(batches(n_e), buffer_size=2):
        key, ki = jax.random.split(key)
        params, bn_state, opt_state, loss = step(
            params, bn_state, opt_state, b, ki
        )
    float(loss)
    train_bps = n_e / (time.perf_counter() - t0)

    # --- eval through the native assembly -----------------------------------
    eval_users = 0
    n_ev = 10
    it = test_s.epoch_batches(shuffle=False)
    b = next(it)
    r, p = eval_step(params, bn_state, b)
    float(r)  # compile
    t0 = time.perf_counter()
    for i, b in enumerate(it):
        if i == n_ev:
            break
        r, p = eval_step(params, bn_state, b)
        eval_users += int(np.asarray(b.seed_users).shape[0])
    float(r)
    eval_ups = eval_users / (time.perf_counter() - t0)

    result = {
        "metric": "encdec_train_users_per_sec_200k",
        "value": round(train_bps * BATCH, 1),
        "unit": "users/s",
        "vs_baseline": None,
        "scale": {
            "num_users": NUM_USERS, "num_items": NUM_ITEMS,
            "train_edges": int(len(g.edges[list(g.edges)[0]][0])),
        },
        "host_cpu_count": os.cpu_count(),
        "data_build_s": round(build_s, 1),
        "subgraph_edges_per_sec": round(train_bps * edges_per_batch, 1),
        "sampler_only_batches_per_sec": round(sampler_bps, 2),
        "sampler_2worker_batches_per_sec": round(par_bps, 2),
        "worker_feed_curve": worker_curve,
        "device_step_only_batches_per_sec": round(step_bps, 2),
        "dp_saturation_streams": round(sampler_bps / step_bps, 2),
        "dp_saturation_streams_2workers": round(par_bps / step_bps, 2),
        "eval_users_per_sec": round(eval_ups, 1),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(__file__), "BENCH_ENCDEC.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
