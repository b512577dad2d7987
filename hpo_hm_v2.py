"""H&M-scale LightGCN HPO v2: successive halving over 1000-step budgets
(VERDICT r4 item 4 — the reference's hyperband early-termination,
``sweep.yaml:24-27``, realized through ``train/hpo.run_successive_halving``
+ the pipeline's checkpoint/resume).

Round-4's flat study (HPO_HM.json) fixed eval_embeddings="final" and found
lr=1e-2, λ=1e-6 at a 300-step budget. This stage explores the knobs that
study left fixed — deeper propagation (K), a hotter lr, a lighter λ —
with rung 1 pruning at 300 steps and rung 2 finishing the survivors at the
flagship's 1000-step budget by RESUMING their rung-1 optimizer state (the
lr-decay schedule is set from the FINAL budget so a resumed trial is a true
continuation of one 1000-step run).

Writes ``HPO_HM2.json``. Run serialized with the other TPU benches.
"""
import argparse
import dataclasses
import json
import time

import numpy as np

from bench_hm import build_data, make_cfg, popularity_recall
from laplace_gnn_recommendation_tpu.train.hpo import run_successive_halving

EVAL_EVERY = 25
RUNGS = (300, 1000)

CANDIDATES = [
    {"learning_rate": 1e-2, "Lambda": 1e-6, "num_iterations": 4},  # incumbent
    {"learning_rate": 2e-2, "Lambda": 1e-6, "num_iterations": 4},
    {"learning_rate": 1e-2, "Lambda": 3e-7, "num_iterations": 4},
    {"learning_rate": 1e-2, "Lambda": 1e-6, "num_iterations": 6},
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rungs", type=int, nargs="+", default=list(RUNGS))
    ap.add_argument("--work-dir", default="/tmp/hpo_hm_sh")
    args = ap.parse_args()
    rungs = tuple(args.rungs)

    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import train

    data, _eu, _ei, build_s = build_data()
    pop = popularity_recall(make_cfg(epochs=1), data)
    print(f"| popularity baseline recall@12 (cap 20k): {pop:.5f}", flush=True)

    rows = []

    def objective(cfg, budget, trial_dir):
        cfg = dataclasses.replace(
            cfg, epochs=budget, artifact_dir=trial_dir, resume=True,
            checkpoint_every=max(1, budget - 1),
            # schedule from the FINAL budget: a resumed rung continues the
            # same staircase instead of re-annealing
            lr_decay_every=max(1, rungs[-1] // 67),
        )
        t0 = time.perf_counter()
        stats = train(
            cfg, data, export=False, eval_embeddings="final",
            log_fn=lambda *_: None,
        )
        row = {
            "budget": budget,
            "learning_rate": cfg.learning_rate, "Lambda": cfg.Lambda,
            "num_iterations": cfg.num_iterations,
            "best_val_recall@12_cap20k": stats.recall_val,
            "test_recall@12_cap20k": stats.recall_test,
            "final_loss": stats.loss,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        rows.append(row)
        print("| trial " + json.dumps(row), flush=True)
        return 1.0 - stats.recall_val

    base = make_cfg(eval_every=EVAL_EVERY, select_best_val=True)
    out = run_successive_halving(
        objective, base, param_sets=CANDIDATES, rungs=rungs, eta=2,
        work_dir=args.work_dir,
    )

    best_row = max(
        (r for r in rows if r["budget"] == rungs[-1]),
        key=lambda r: r["best_val_recall@12_cap20k"],
        default=None,
    )
    payload = {
        "graph": {"num_users": data.num_users, "num_items": data.num_items,
                  "train_edges": int(data.train_graph.num_edges),
                  "build_s": round(build_s, 1)},
        "rungs": list(rungs), "eta": 2, "eval_every": EVAL_EVERY,
        "eval_user_cap": 20_000,
        "popularity_recall@12_cap20k": pop,
        "trials": rows,
        "sh_history": out["history"],
        "best": out["best"],
        "best_final_rung_row": best_row,
        "best_vs_popularity": (
            round(best_row["test_recall@12_cap20k"] / pop, 2)
            if best_row and pop else None
        ),
    }
    with open("HPO_HM2.json", "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({
        "metric": "hpo_hm_sh_best_val_recall@12",
        "value": best_row["best_val_recall@12_cap20k"] if best_row else None,
        "vs_popularity": payload["best_vs_popularity"],
    }))


if __name__ == "__main__":
    main()
