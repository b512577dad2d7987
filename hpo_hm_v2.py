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

Execution model: one PROCESS per (trial, rung) leg, driven by
``run_hpo_hm_sh.sh`` — the in-process study form (the library engine
``train/hpo.run_successive_halving`` drives the same rung logic and remains
the API for normal environments) was frozen ~20 min in by an axon-relay
connection wedge (round-4 failure mode: CPU time frozen, axon-conn-read in
sk_wait_data, while a FRESH process reaches the device fine). Per-leg
processes + 100-step checkpoints + resume bound the blast radius of a
wedge to ≤100 steps.

Writes ``HPO_HM2.json``. Run serialized with the other TPU benches.
"""
import argparse
import dataclasses
import json
import os
import time

from bench_hm import build_data, make_cfg, popularity_recall

EVAL_EVERY = 25
RUNGS = (300, 1000)

CANDIDATES = [
    {"learning_rate": 1e-2, "Lambda": 1e-6, "num_iterations": 4},  # incumbent
    {"learning_rate": 2e-2, "Lambda": 1e-6, "num_iterations": 4},
    {"learning_rate": 1e-2, "Lambda": 3e-7, "num_iterations": 4},
    {"learning_rate": 1e-2, "Lambda": 1e-6, "num_iterations": 6},
]


def run_one_trial(trial_idx: int, budget: int, work_dir: str, rows_file: str):
    """Run ONE (trial, cumulative-budget) leg in THIS process and append
    its row to ``rows_file`` (JSONL).

    Per-trial processes bound the axon-relay wedge blast radius (a wedged
    connection froze the whole in-process study ~20 min in — the round-4
    failure mode; a fresh process reaches the device fine). Retries are
    cheap: each trial checkpoints every 100 steps into its own work dir
    and resumes from the newest checkpoint.
    """
    from laplace_gnn_recommendation_tpu.train.hpo import make_trial_config
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import train

    data, _eu, _ei, build_s = build_data()
    params = CANDIDATES[trial_idx]
    base = make_cfg(eval_every=EVAL_EVERY, select_best_val=True)
    cfg = make_trial_config(base, params)
    trial_dir = os.path.join(work_dir, f"trial_{trial_idx}")
    os.makedirs(trial_dir, exist_ok=True)
    cfg = dataclasses.replace(
        cfg, epochs=budget, artifact_dir=trial_dir, resume=True,
        checkpoint_every=100,
        # schedule from the FINAL budget: a resumed rung continues the
        # same staircase instead of re-annealing
        lr_decay_every=max(1, RUNGS[-1] // 67),
    )
    t0 = time.perf_counter()
    stats = train(
        cfg, data, export=False, eval_embeddings="final",
        log_fn=lambda *_: None,
    )
    row = {
        "trial": trial_idx, "budget": budget,
        "learning_rate": cfg.learning_rate, "Lambda": cfg.Lambda,
        "num_iterations": cfg.num_iterations,
        "best_val_recall@12_cap20k": stats.recall_val,
        "test_recall@12_cap20k": stats.recall_test,
        "final_loss": stats.loss,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    with open(rows_file, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("| trial " + json.dumps(row), flush=True)


def load_rows(rows_file: str):
    rows = []
    if os.path.exists(rows_file):
        for line in open(rows_file):
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    # a retried (trial, budget) leg appends a second row: keep the LAST
    seen = {}
    for r in rows:
        seen[(r["trial"], r["budget"])] = r
    return list(seen.values())


def select_survivors(rows_file: str, budget: int, eta: int = 2):
    """Print the top-1/eta trial indices at ``budget`` (SH rung cut)."""
    rows = [r for r in load_rows(rows_file) if r["budget"] == budget]
    rows.sort(key=lambda r: -r["best_val_recall@12_cap20k"])
    keep = max(1, len(rows) // eta)
    print(" ".join(str(r["trial"]) for r in rows[:keep]))


def aggregate(rows_file: str):
    data, _eu, _ei, build_s = build_data()
    pop = popularity_recall(make_cfg(epochs=1), data)
    rows = sorted(load_rows(rows_file), key=lambda r: (r["budget"], r["trial"]))
    best_row = max(
        (r for r in rows if r["budget"] == RUNGS[-1]),
        key=lambda r: r["best_val_recall@12_cap20k"],
        default=None,
    )
    payload = {
        "graph": {"num_users": data.num_users, "num_items": data.num_items,
                  "train_edges": int(data.train_graph.num_edges)},
        "rungs": list(RUNGS), "eta": 2, "eval_every": EVAL_EVERY,
        "eval_user_cap": 20_000,
        "engine": ("successive halving, one process per (trial, rung) leg "
                   "with checkpoint-resume (relay-wedge isolation); "
                   "selection on best-val recall@12"),
        "popularity_recall@12_cap20k": pop,
        "trials": rows,
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trial", type=int, default=None)
    ap.add_argument("--budget", type=int, default=None)
    ap.add_argument("--select-at", type=int, default=None,
                    help="print surviving trial indices at this budget")
    ap.add_argument("--aggregate", action="store_true")
    ap.add_argument("--work-dir", default="/tmp/hpo_hm_sh")
    ap.add_argument("--rows-file", default="/tmp/hpo_hm_rows.jsonl")
    args = ap.parse_args()

    if args.select_at is not None:
        select_survivors(args.rows_file, args.select_at)
    elif args.aggregate:
        aggregate(args.rows_file)
    else:
        assert args.trial is not None and args.budget is not None
        run_one_trial(args.trial, args.budget, args.work_dir, args.rows_file)


if __name__ == "__main__":
    main()
