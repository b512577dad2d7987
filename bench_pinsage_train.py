"""PinSAGE at-scale quality flagship (VERDICT r4 item 5a).

Trains the full PinSAGE stack on the H&M-shaped clustered graph (1.37M
users × 105k items, latent style clusters → real learnable item-item
structure) with a leave-last-2 per-user split, and reports the HITS@12
convergence curve against the popularity and random baselines evaluated
through the SAME latest-item-NN protocol (reference ``pinsage/evaluation.py:
18-73``; published reference quality: HITS@10 0.01241 on a MovieLens-class
dataset, ``pinsage/README.md:35``).

Merges a ``train`` quality block into ``BENCH_PINSAGE.json``.
Run on the real TPU: ``python bench_pinsage_train.py [--steps N]``.
"""
import argparse
import json
import os
import time

import numpy as np

NUM_USERS = 1_371_980
NUM_ITEMS = 104_547
K = 12
EVAL_USER_CAP = 10_000
HIDDEN = 64


def build_split_data():
    """Clustered H&M edges → leave-last-2 per-user split → PinSAGEData
    whose CSRs contain ONLY train edges (leak-free retrieval eval)."""
    from laplace_gnn_recommendation_tpu.data.graph import HostCSR
    from laplace_gnn_recommendation_tpu.data.pinsage_data import PinSAGEData

    cache = f"/tmp/hm_clustered_{NUM_USERS}_{NUM_ITEMS}_200.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        eu, ei = z["eu"], z["ei"]
    else:
        from laplace_gnn_recommendation_tpu.data.synthetic import (
            latent_bipartite_edges,
        )

        eu, ei, _, _ = latent_bipartite_edges(
            seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS,
            avg_degree=23.0, num_clusters=200,
            in_cluster_p=0.85, popularity_alpha=0.8,
        )
        np.savez(cache, eu=eu, ei=ei)

    # leave-last-2 in stored order (the synthetic stream's chronology) —
    # the reference's train_test_split_by_time semantics
    # (run_data_splitting.py:36-52), vectorized
    order = np.argsort(eu, kind="stable")
    eu_s, ei_s = eu[order], ei[order]
    deg = np.bincount(eu_s, minlength=NUM_USERS)
    starts = np.concatenate([[0], np.cumsum(deg)])
    pos_in_user = np.arange(len(eu_s)) - starts[eu_s]
    is_test = (pos_in_user == deg[eu_s] - 1) & (deg[eu_s] >= 3)
    is_val = (pos_in_user == deg[eu_s] - 2) & (deg[eu_s] >= 3)
    is_train = ~(is_test | is_val)

    tr_u, tr_i = eu_s[is_train], ei_s[is_train]
    latest = np.full(NUM_USERS, -1, np.int64)
    latest[tr_u] = tr_i  # stored order: last assignment = latest train item

    val_items = [np.empty(0, np.int64)] * NUM_USERS
    test_items = [np.empty(0, np.int64)] * NUM_USERS
    vu, vi = eu_s[is_val], ei_s[is_val]
    tu, ti = eu_s[is_test], ei_s[is_test]
    for u, i in zip(vu.tolist(), vi.tolist()):
        val_items[u] = np.asarray([i], np.int64)
    for u, i in zip(tu.tolist(), ti.tolist()):
        test_items[u] = np.asarray([i], np.int64)

    data = PinSAGEData(
        num_users=NUM_USERS, num_items=NUM_ITEMS,
        user_csr=HostCSR.from_edges(tr_u, tr_i, NUM_USERS, NUM_ITEMS),
        item_csr=HostCSR.from_edges(tr_i, tr_u, NUM_ITEMS, NUM_USERS),
        item_features=np.zeros((NUM_ITEMS, 1), np.int32),
        item_features_float=None,
        latest_item_per_user=latest,
        val_items=val_items, test_items=test_items,
    )
    return data, tr_u, tr_i


def baseline_hits(data, tr_i, split="test", cap=EVAL_USER_CAP):
    """Popularity + random HITS@12 through the same exclusion protocol."""
    gt = data.val_items if split == "val" else data.test_items
    pop_order = np.argsort(np.bincount(tr_i, minlength=NUM_ITEMS))[::-1]
    top_pool = pop_order[:512]
    users = [
        u for u in range(data.num_users)
        if len(gt[u]) > 0 and data.latest_item_per_user[u] >= 0
    ]
    users = [users[i] for i in
             np.linspace(0, len(users) - 1, min(cap, len(users))).astype(np.int64)]
    rng = np.random.default_rng(0)
    hits_pop, hits_rnd = [], []
    for u in users:
        interacted = set(data.user_csr.neighbors(u).tolist())
        recs = [i for i in top_pool if i not in interacted][:K]
        hits_pop.append(bool(np.isin(recs, gt[u]).any()))
        hits_rnd.append(bool(np.isin(rng.integers(0, NUM_ITEMS, K), gt[u]).any()))
    return float(np.mean(hits_pop)), float(np.mean(hits_rnd))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=3e-4)
    args = ap.parse_args()

    import jax

    from laplace_gnn_recommendation_tpu.train import pinsage_pipeline as P

    t0 = time.perf_counter()
    data, tr_u, tr_i = build_split_data()
    build_s = time.perf_counter() - t0
    print(f"data build: {build_s:.1f}s train_edges={len(tr_u)}", flush=True)

    t0 = time.perf_counter()
    pop_hits, rnd_hits = baseline_hits(data, tr_i)
    print(f"baselines: popularity HITS@{K}={pop_hits:.4f} "
          f"random={rnd_hits:.4f} ({time.perf_counter()-t0:.0f}s)", flush=True)

    cfg = P.PinSAGEConfig(
        hidden_dims=HIDDEN, batch_size=args.batch, lr=args.lr, k=K,
        num_epochs=max(1, args.steps // args.eval_every),
        batches_per_epoch=args.eval_every, seed=0,
    )
    curve = []
    t_train = time.perf_counter()

    orig_hits = P.hits_at_k

    def capped_hits(data_, h, k, split="val", **kw):
        kw.setdefault("user_cap", EVAL_USER_CAP)
        return orig_hits(data_, h, k, split, **kw)

    P.hits_at_k = capped_hits
    try:
        def log_fn(msg):
            print(msg, flush=True)
            if "HITS" in msg and "val" in msg:
                curve.append(float(msg.rsplit(":", 1)[1]))

        res = P.train(cfg, data, log_fn=log_fn)
    finally:
        P.hits_at_k = orig_hits
    wall = time.perf_counter() - t_train

    payload = {
        "scale": {"num_users": NUM_USERS, "num_items": NUM_ITEMS,
                  "train_edges": int(len(tr_u))},
        "config": {"steps": args.steps, "batch": args.batch, "lr": args.lr,
                   "hidden": HIDDEN, "eval_user_cap": EVAL_USER_CAP},
        "wall_s": round(wall, 1),
        "triples_per_sec_train": round(args.steps * args.batch / wall, 1),
        "val_hits_curve@12": [round(v, 5) for v in curve],
        "val_hits@12": round(res["val_hits"], 5),
        "test_hits@12": round(res["test_hits"], 5),
        "popularity_hits@12": round(pop_hits, 5),
        "random_hits@12": round(rnd_hits, 5),
        "vs_popularity": (
            round(res["test_hits"] / pop_hits, 2) if pop_hits else None
        ),
    }
    # merge into BENCH_PINSAGE.json as the quality block
    bench = {}
    if os.path.exists("BENCH_PINSAGE.json"):
        try:
            bench = json.load(open("BENCH_PINSAGE.json"))
        except (json.JSONDecodeError, OSError):
            bench = {}
    bench["train"] = payload
    with open("BENCH_PINSAGE.json.tmp", "w") as f:
        json.dump(bench, f, indent=1)
    os.replace("BENCH_PINSAGE.json.tmp", "BENCH_PINSAGE.json")
    print(json.dumps({"metric": "pinsage_test_hits@12",
                      "value": payload["test_hits@12"],
                      "vs_popularity": payload["vs_popularity"]}))


if __name__ == "__main__":
    main()
