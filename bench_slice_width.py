"""Microbench: src-slice width sweep for the H&M to_item direction.

The to_item segsum gathers USER rows (1.37M-row table) through src-slices.
Round-4 used 131072-row slices (194M rows/s measured). The XLA gather
engine's fast zone is table-size dependent (the 105k-row item table gathers
at 326M rows/s), so narrower windows may buy the to_item direction ~40%.
Also times the scatter combine vs a per-slice sorted-combine candidate.

Writes SLICE_SWEEP.json; run on the real TPU.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
    BlockedSegmentPlan,
    blocked_segment_sum,
)

NUM_USERS = 1_371_980
NUM_ITEMS = 104_547
DIM = 32
REPS = 5


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timed(fn, *args, reps=REPS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _load_edges():
    import glob

    hits = sorted(glob.glob(f"/tmp/hm_clustered_{NUM_USERS}_{NUM_ITEMS}_*.npz"))
    if hits:
        z = np.load(hits[0])
        return z["eu"], z["ei"]
    from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges

    return random_bipartite_edges(
        seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS, avg_degree=23.0,
        popularity_alpha=0.8,
    )


def main():
    eu, ei = _load_edges()
    e = len(eu)
    du = np.bincount(eu, minlength=NUM_USERS)
    di = np.bincount(ei, minlength=NUM_ITEMS)
    w = 1.0 / np.sqrt(np.maximum(du[eu] * di[ei], 1.0))
    im = np.lexsort((eu, ei))
    dst_i, src_u, w_i = ei[im], eu[im], w[im]

    rng = np.random.default_rng(0)
    u_tab = jnp.asarray(rng.normal(size=(NUM_USERS, DIM)).astype(np.float32))

    f = jax.jit(
        lambda p, t: blocked_segment_sum(p, t, gather_bf16=True)
    )

    import sys

    widths = (
        [int(x) for x in sys.argv[1:]]
        if len(sys.argv) > 1
        else [262144, 131072, 65536, 32768]
    )
    results = {"edges": int(e), "to_item_sweep": []}
    ref = None
    for slice_rows in widths:
        t0 = time.perf_counter()
        plan = BlockedSegmentPlan.from_edges_src_sliced(
            dst_i, src_u, w_i, NUM_ITEMS, NUM_USERS,
            slice_rows=slice_rows,
        )
        build_s = time.perf_counter() - t0
        dt = timed(f, plan, u_tab)
        out = f(plan, u_tab)
        if ref is None:
            ref = np.asarray(out)
        else:
            np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)
        row = {
            "slice_rows": slice_rows,
            "num_slices": plan.num_src_slices,
            "chunks": int(plan.src.shape[0]),
            "seconds": round(dt, 4),
            "rows_per_s_M": round(e / dt / 1e6, 1),
            "plan_build_s": round(build_s, 1),
        }
        results["to_item_sweep"].append(row)
        print(row, flush=True)

    with open("SLICE_SWEEP.json", "w") as fjson:
        json.dump(results, fjson, indent=1)
    print("done")


if __name__ == "__main__":
    main()
