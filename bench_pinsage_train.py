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


def _run_leg(args):
    """One process leg: resume from the state dir's newest checkpoint, train
    ONE epoch (eval_every steps), eval val HITS, checkpoint, append a curve
    row, exit. The leg that completes the final epoch also runs the test
    eval and leaves its result in the state file. Process-per-leg isolates
    the device-relay wedge that reproducibly killed the TPU worker partway
    through single-process runs of this flagship (UNAVAILABLE: TPU worker
    process crashed; same failure class the HPO study's
    one-process-per-rung legs were built for)."""
    from laplace_gnn_recommendation_tpu.train import pinsage_pipeline as P

    t0 = time.perf_counter()
    data, tr_u, tr_i = build_split_data()
    print(f"data build: {time.perf_counter()-t0:.1f}s "
          f"train_edges={len(tr_u)}", flush=True)

    state_path = os.path.join(args.state_dir, "state.json")
    state = json.load(open(state_path)) if os.path.exists(state_path) else {
        "curve": [], "losses": [], "train_wall_s": 0.0,
    }

    cfg = P.PinSAGEConfig(
        hidden_dims=HIDDEN, batch_size=args.batch, lr=args.lr, k=K,
        num_epochs=max(1, args.steps // args.eval_every),
        batches_per_epoch=args.eval_every, seed=0,
    )
    orig_hits = P.hits_at_k

    def capped_hits(data_, h, k, split="val", **kw):
        kw.setdefault("user_cap", EVAL_USER_CAP)
        return orig_hits(data_, h, k, split, **kw)

    P.hits_at_k = capped_hits
    t_train = time.perf_counter()
    try:
        res = P.train(
            cfg, data, log_fn=lambda m: print(m, flush=True),
            checkpoint_dir=args.state_dir, max_epochs_this_run=1,
        )
    finally:
        P.hits_at_k = orig_hits
    state["train_wall_s"] += time.perf_counter() - t_train
    state["curve"].append(round(float(res["val_hits"]), 5))
    state["losses"].append(round(float(res["loss"]), 5))
    if res["completed"]:
        state["test_hits"] = round(float(res["test_hits"]), 5)
        state["completed"] = True
    with open(state_path + ".tmp", "w") as f:
        json.dump(state, f)
    os.replace(state_path + ".tmp", state_path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--state-dir", default="/tmp/pinsage_flagship")
    ap.add_argument("--retries", type=int, default=3,
                    help="consecutive no-progress legs tolerated")
    ap.add_argument("--worker", action="store_true",
                    help="internal: run one training leg and exit")
    args = ap.parse_args()

    if args.worker:
        _run_leg(args)
        return

    import subprocess
    import sys

    os.makedirs(args.state_dir, exist_ok=True)
    state_path = os.path.join(args.state_dir, "state.json")

    def read_state():
        if os.path.exists(state_path):
            return json.load(open(state_path))
        return {"curve": [], "losses": [], "train_wall_s": 0.0}

    num_epochs = max(1, args.steps // args.eval_every)
    stalls = 0
    while not read_state().get("completed"):
        before = len(read_state()["curve"])
        cmd = [sys.executable, os.path.abspath(__file__), "--worker",
               "--steps", str(args.steps),
               "--eval-every", str(args.eval_every),
               "--batch", str(args.batch), "--lr", str(args.lr),
               "--state-dir", args.state_dir]
        r = subprocess.run(cmd, timeout=3600)
        progressed = len(read_state()["curve"]) > before
        print(f"[driver] leg rc={r.returncode} progressed={progressed} "
              f"epochs={len(read_state()['curve'])}/{num_epochs}", flush=True)
        if not progressed:
            stalls += 1
            if stalls >= args.retries:
                raise SystemExit(
                    f"no progress after {stalls} consecutive legs")
        else:
            stalls = 0

    state = read_state()
    data, tr_u, tr_i = build_split_data()
    t0 = time.perf_counter()
    pop_hits, rnd_hits = baseline_hits(data, tr_i)
    print(f"baselines: popularity HITS@{K}={pop_hits:.4f} "
          f"random={rnd_hits:.4f} ({time.perf_counter()-t0:.0f}s)", flush=True)

    wall = state["train_wall_s"]
    payload = {
        "scale": {"num_users": NUM_USERS, "num_items": NUM_ITEMS,
                  "train_edges": int(len(tr_u))},
        "config": {"steps": args.steps, "batch": args.batch, "lr": args.lr,
                   "hidden": HIDDEN, "eval_user_cap": EVAL_USER_CAP},
        "wall_s": round(wall, 1),
        "triples_per_sec_train": round(args.steps * args.batch / wall, 1),
        "val_hits_curve@12": state["curve"],
        "val_hits@12": state["curve"][-1] if state["curve"] else None,
        "test_hits@12": state["test_hits"],
        "popularity_hits@12": round(pop_hits, 5),
        "random_hits@12": round(rnd_hits, 5),
        "vs_popularity": (
            round(state["test_hits"] / pop_hits, 2) if pop_hits else None
        ),
        "note": (
            "process-per-epoch legs with checkpoint/resume "
            "(relay-wedge isolation); wall_s sums the legs' train+eval "
            "time and includes per-leg recompiles"
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
