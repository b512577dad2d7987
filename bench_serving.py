"""Serving-path latency benchmark (VERDICT r1 item 6: "bench request
latency" for the ranking path).

Prints one JSON line with the two serving stages on an ML-1M-scale graph:

* ``RetrievalServer.recommend`` — stage-1 MIPS retrieval: p50/p95 latency
  for a 256-user request over the full catalog with seen-item exclusion,
* ``RankingServer.recommend`` — stage-2 candidate re-ranking: p50/p95 for a
  24-user request (matcher candidates → native eval batch assembly → hetero
  SAGE infer → top-k). ``vs_baseline`` compares the native eval assembly
  against the per-user Python assembly on the same server config — the
  latency-critical path VERDICT r1 flagged.
"""
import json
import os
import time

import numpy as np


def _percentiles(times):
    a = np.asarray(times) * 1e3
    return round(float(np.percentile(a, 50)), 2), round(float(np.percentile(a, 95)), 2)


def main():
    from laplace_gnn_recommendation_tpu.configs import Config
    from laplace_gnn_recommendation_tpu.data.link_pred_data import (
        create_link_pred_data,
    )
    from laplace_gnn_recommendation_tpu.data.synthetic import (
        movielens_like_edges,
        random_hetero_graph,
    )
    from laplace_gnn_recommendation_tpu.serving import (
        RankingServer,
        RetrievalServer,
    )

    rng = np.random.default_rng(0)

    # ---- stage 1: retrieval ------------------------------------------------
    eu, ei, num_users, num_items = movielens_like_edges(seed=0, scale=1.0)
    user_emb = rng.normal(size=(num_users, 64)).astype(np.float32)
    item_emb = rng.normal(size=(num_items, 64)).astype(np.float32)
    rsv = RetrievalServer(
        user_emb, item_emb, k=12, exclude_edges=(eu, ei), batch_size=256
    )
    rsv.recommend(np.arange(256))  # compile
    lat = []
    for _ in range(20):
        ids = rng.integers(0, num_users, 256)
        t0 = time.perf_counter()
        rsv.recommend(ids)
        lat.append(time.perf_counter() - t0)
    r_p50, r_p95 = _percentiles(lat)

    # ---- stage 2: ranking (native vs python eval assembly) ----------------
    import jax

    from laplace_gnn_recommendation_tpu.models import sage

    g = random_hetero_graph(seed=1, num_users=600, num_items=400, avg_degree=12)
    cfg = Config(
        batch_size=24, num_neighbors=32, n_hop_neighbors=2, k=12,
        candidate_pool_size=20, hidden_layer_size=32,
        encoder_layer_output_size=16,
    )
    data = create_link_pred_data(g, cfg)
    info = sage.get_feature_info(g)
    params, bn = sage.init_sage_params(jax.random.PRNGKey(0), cfg, info)

    def measure(use_native: bool, n_req: int):
        srv = RankingServer(cfg, data, params, bn)
        srv.sampler._native = srv.sampler._native if use_native else None
        srv.recommend(np.arange(24))  # compile
        ts = []
        for _ in range(n_req):
            ids = rng.integers(0, 600, 24)
            t0 = time.perf_counter()
            srv.recommend(ids)
            ts.append(time.perf_counter() - t0)
        return ts

    nat = measure(True, 30)
    py = measure(False, 10)
    n_p50, n_p95 = _percentiles(nat)
    p_p50, _ = _percentiles(py)

    # ---- stage 1 at H&M catalog scale: int8 vs f32 (VERDICT r2 item 9) ----
    hm_items = 104_547
    item_hm = rng.normal(size=(hm_items, 64)).astype(np.float32)
    user_hm = rng.normal(size=(4096, 64)).astype(np.float32)

    def retrieval_lat(quantized: bool):
        srv = RetrievalServer(
            user_hm, item_hm, k=12, batch_size=256, quantized=quantized
        )
        srv.recommend(np.arange(256))  # compile
        ts, tops = [], []
        for r in range(20):
            ids = (np.arange(256) + 256 * r) % 4096
            t0 = time.perf_counter()
            items, _ = srv.recommend(ids)
            ts.append(time.perf_counter() - t0)
            tops.append(items)
        return ts, np.concatenate(tops)

    q_ts, q_top = retrieval_lat(True)
    f_ts, f_top = retrieval_lat(False)
    q_p50, q_p95 = _percentiles(q_ts)
    f_p50, f_p95 = _percentiles(f_ts)
    # top-12 set agreement per request row
    agree = np.mean(
        [len(np.intersect1d(a, b)) / 12.0 for a, b in zip(q_top, f_top)]
    )

    ranking_result = {
        "metric": "ranking_request_latency_p50_ms",
        "value": n_p50,
        "unit": "ms",
        "vs_baseline": round(p_p50 / n_p50, 2),
        "ranking_p95_ms": n_p95,
        "retrieval_p50_ms": r_p50,
        "retrieval_p95_ms": r_p95,
    }
    quant_result = {
        "metric": "quantized_retrieval_105k_p50_ms",
        "value": q_p50,
        "unit": "ms",
        "vs_f32_p50": round(f_p50 / q_p50, 2) if q_p50 else None,
        "int8_p95_ms": q_p95,
        "f32_p50_ms": f_p50,
        "f32_p95_ms": f_p95,
        "top12_agreement": round(float(agree), 4),
    }
    print(json.dumps(ranking_result))
    print(json.dumps(quant_result))
    # merge-preserve blocks other writers own (device_amortized from
    # bench_serving_device.py) instead of clobbering the artifact
    path = os.path.join(os.path.dirname(__file__), "BENCH_SERVING.json")
    payload = {}
    if os.path.exists(path):
        try:
            payload = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            payload = {}
    payload["ranking"] = ranking_result
    payload["quantized_retrieval"] = quant_result
    with open(path + ".tmp", "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(path + ".tmp", path)


if __name__ == "__main__":
    main()
