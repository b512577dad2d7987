"""Micro-bench: the encdec conv aggregation alternatives at the probed
200k-shape batch (ROOFLINE.json encdec_step says the conv segment-sums are
the step's dominant stage; XLA's TPU scatter-add is the suspected binding
resource). Compares, at [E=147712 edges, D=64] into [NU=6400] / [NI=31872]:

  a. jax.ops.segment_sum (production today)
  b. segment_sum with indices_are_sorted=True over host-sorted edges
  c. one-hot MXU contraction per 128-edge chunk (the blocked-SpMM form,
     plan built on device from sorted edges)

Merges a ``conv_agg_alternatives`` block into ROOFLINE.json. Run on TPU.
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

NU, NI, E, D = 6400, 31872, 147712, 64
REPS = 20


def _sync(x):
    np.asarray(jnp.ravel(jax.tree.leaves(x)[0])[0])


def timed(label, fn, *args):
    out = fn(*args)
    _sync(out)
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        _sync(out)
        dts.append((time.perf_counter() - t0) / REPS)
    dt = min(dts)
    print(f"{label:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # Zipf-ish dst distribution like a real batch (popular users/items)
    src_u = rng.integers(0, NU, E).astype(np.int32)
    dst_i = (NI * rng.power(3.0, E)).astype(np.int32) % NI
    msgs = jnp.asarray(rng.normal(size=(E, D)).astype(np.float32))
    du = jnp.asarray(src_u)
    di = jnp.asarray(dst_i)

    rows = {}

    @jax.jit
    def seg_unsorted(m, d_):
        return jax.ops.segment_sum(m, d_, num_segments=NI)

    rows["segment_sum_unsorted_ms"] = timed(
        "segment_sum (unsorted, production)", seg_unsorted, msgs, di
    ) * 1e3

    order = np.argsort(dst_i, kind="stable")
    di_s = jnp.asarray(dst_i[order])
    perm = jnp.asarray(order.astype(np.int32))

    @jax.jit
    def seg_sorted(m, p, d_):
        return jax.ops.segment_sum(
            m[p], d_, num_segments=NI, indices_are_sorted=True
        )

    rows["segment_sum_sorted_ms"] = timed(
        "gather-permute + segment_sum (sorted)", seg_sorted, msgs, perm, di_s
    ) * 1e3

    # blocked one-hot form: chunks of 128 sorted edges, R_c=8 local rows
    from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
        BlockedSegmentPlan,
        blocked_segment_sum,
    )

    t0 = time.perf_counter()
    plan = BlockedSegmentPlan.from_edges(
        dst_i[order].astype(np.int64), src_u[order].astype(np.int64),
        np.ones(E, np.float32), NI, chunk_bucket=1,
        sorted_combine=False,
    )
    plan_build_s = time.perf_counter() - t0
    print(f"blocked plan build (host): {plan_build_s*1e3:.1f} ms", flush=True)

    table = jnp.asarray(rng.normal(size=(NU, D)).astype(np.float32))

    @jax.jit
    def seg_blocked(p, t):
        return blocked_segment_sum(p, t)

    rows["blocked_onehot_ms"] = timed(
        "blocked one-hot MXU (host plan)", seg_blocked, plan, table
    ) * 1e3
    rows["blocked_plan_build_host_ms"] = round(plan_build_s * 1e3, 1)

    # numerical sanity: blocked == segment path on the same operands
    want = jax.ops.segment_sum(table[jnp.asarray(src_u)], di, num_segments=NI)
    got = seg_blocked(plan, table)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3
    )

    rows = {k: round(v, 2) for k, v in rows.items()}
    print(rows)
    roofline = {}
    if os.path.exists("ROOFLINE.json"):
        try:
            roofline = json.load(open("ROOFLINE.json"))
        except (json.JSONDecodeError, OSError):
            roofline = {}
    roofline["conv_agg_alternatives"] = {
        "shape": {"num_dst": NI, "edges": E, "dim": D},
        **rows,
    }
    with open("ROOFLINE.json.tmp", "w") as f:
        json.dump(roofline, f, indent=1)
    os.replace("ROOFLINE.json.tmp", "ROOFLINE.json")
    print("ROOFLINE.json updated")


if __name__ == "__main__":
    main()
