"""Decompose the H&M-scale LightGCN train step (VERDICT r2 item 2).

Isolates each resource of the blocked segment-sum on the real chip:
gather+multiply only, one-hot contract without scatter, full segsum,
both directions, K-loop forward, full value_and_grad — so the
gather-roofline gap has a named owner. All operands ride as jit
ARGUMENTS (closure constants overflow the remote compiler's request
limit at this scale).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
    MAX_CHUNKS_PER_SLICE,
    BlockedGraph,
    BlockedSegmentPlan,
    blocked_segment_sum,
    propagate_blocked,
)

NUM_USERS = 1_371_980
NUM_ITEMS = 104_547
DIM = 32
K = 4
REPS = 5

ROUND5_CHANGES = (
    "(1) whole-loop self-adjoint VJP (ops/multiscale.py): the K-loop "
    "multi-scale operator is self-adjoint, so backward = ONE forward on "
    "cotangents - value_and_grad 3389 -> 2450 ms (1.38x; backward now an "
    "exact mirror, 2.0x forward in total). fwd+bwd fraction 0.311 -> 0.43. "
    "(2) Measured dead-ends, kept out of production with artifacts: "
    "262144-row src slices win standalone (to_item 113->101 ms) but regress "
    "the fused two-direction program (236->382 ms both-dirs, K4 fwd "
    "1232->1481 - larger scan windows break XLA's direction overlap; "
    "r5c/r5d); per-slice sorted combine likewise wins standalone (-7 ms) "
    "and loses fused (+150 ms); the double-one-hot chunk-adjacency SpMM "
    "(eliminate the per-edge gather via onehot_dst @ onehot_src on the MXU) "
    "loses 2-4x at the encdec shape (see encdec_step.analysis) and scales "
    "worse here (wide slices blow up the one-hot FLOPs). (3) remaining gap "
    "analysis: per-direction segsums run at 76-100% of their own floors; "
    "the residual is the K-loop's data-dependent latency - the standalone "
    "both-dirs number is pipelined across reps while in-loop iterations "
    "serialize on true dependencies."
)


def _sync(out):
    """Completion barrier: over the axon relay block_until_ready is not a
    real barrier — close every timing window with a scalar D2H."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.numpy.ravel(leaf)[0])


def timed(label, fn, *args, reps=REPS):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{label:48s} {dt*1e3:10.1f} ms", flush=True)
    return dt


@jax.jit
def seg_full(plan, table):
    return blocked_segment_sum(plan, table, gather_bf16=True)


@jax.jit
def seg_gather_only(plan, table):
    """Gather+multiply, reduced per chunk WITHOUT the one-hot contract or
    scatter — the pure gather cost of the same access pattern."""
    tab = table.astype(jnp.bfloat16)
    c = plan.src.shape[0]
    e_c = plan.edges_per_chunk
    s = MAX_CHUNKS_PER_SLICE
    g = -(-c // s)
    pad = g * s - c
    src = jnp.pad(plan.src, ((0, pad), (0, 0))).reshape(g, s, e_c)
    w = jnp.pad(plan.w, ((0, pad), (0, 0))).reshape(g, s, e_c)

    def body(carry, xs):
        src_s, w_s = xs
        msgs = w_s[..., None].astype(jnp.bfloat16) * tab[src_s]
        return carry + jnp.sum(msgs.astype(jnp.float32), axis=(0, 1)), None

    out, _ = jax.lax.scan(body, jnp.zeros((DIM,), jnp.float32), (src, w))
    return out


@jax.jit
def seg_no_scatter(plan, table):
    """Gather + one-hot contract, partials reduced instead of scattered."""
    from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
        _blocked_partial_contract,
    )

    tab = table.astype(jnp.bfloat16)
    c = plan.src.shape[0]
    r_c, e_c = plan.rows_per_chunk, plan.edges_per_chunk
    s = MAX_CHUNKS_PER_SLICE
    g = -(-c // s)
    pad = g * s - c
    src = jnp.pad(plan.src, ((0, pad), (0, 0))).reshape(g, s, e_c)
    w = jnp.pad(plan.w, ((0, pad), (0, 0))).reshape(g, s, e_c)
    local = jnp.pad(plan.local_row, ((0, pad), (0, 0))).reshape(g, s, e_c)

    def body(carry, xs):
        src_s, w_s, local_s = xs
        p = _blocked_partial_contract(src_s, w_s, local_s, tab, r_c, e_c, "highest")
        return carry + jnp.sum(p, axis=(0, 1)), None

    out, _ = jax.lax.scan(body, jnp.zeros((DIM,), jnp.float32), (src, w, local))
    return out


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("num_rows",))
def scatter_only(row_ids, partials, num_rows):
    out = jnp.zeros((num_rows, partials.shape[-1]), jnp.float32)
    return out.at[row_ids.reshape(-1)].add(
        partials.reshape(-1, partials.shape[-1]), mode="drop"
    )


def _load_edges():
    """Reuse whichever H&M-shaped edge cache a bench already built."""
    import glob
    import os

    for pat in (
        f"/tmp/hm_clustered_{NUM_USERS}_{NUM_ITEMS}_*.npz",
        f"/tmp/hm_edges_{NUM_USERS}_{NUM_ITEMS}.npz",
    ):
        hits = sorted(glob.glob(pat))
        if hits:
            z = np.load(hits[0])
            return z["eu"], z["ei"]
    from laplace_gnn_recommendation_tpu.data.synthetic import (
        random_bipartite_edges,
    )

    eu, ei = random_bipartite_edges(
        seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS, avg_degree=23.0,
        popularity_alpha=0.8,
    )
    np.savez(f"/tmp/hm_edges_{NUM_USERS}_{NUM_ITEMS}.npz", eu=eu, ei=ei)
    return eu, ei


def main():
    eu, ei = _load_edges()
    # dedup like create_lightgcn_data would; use all edges as "train"
    t0 = time.perf_counter()
    bg = BlockedGraph.from_host_edges(eu, ei, NUM_USERS, NUM_ITEMS)
    for leaf in jax.tree.leaves(bg):
        _sync(leaf)
    print(f"plan build+upload: {time.perf_counter()-t0:.1f}s", flush=True)
    e = len(eu)
    print(f"edges: {e}  to_user chunks={bg.to_user.src.shape} slices={bg.to_user.num_src_slices}")
    print(f"        to_item chunks={bg.to_item.src.shape} slices={bg.to_item.num_src_slices}", flush=True)

    rng = np.random.default_rng(0)
    u32 = jnp.asarray(rng.normal(size=(NUM_USERS, DIM)).astype(np.float32))
    i32 = jnp.asarray(rng.normal(size=(NUM_ITEMS, DIM)).astype(np.float32))

    # --- to_user (gather from the 105k-item table, sorted combine to 1.37M)
    print(f"to_user sorted_combine={bg.to_user.sorted_combine} "
          f"r_c={bg.to_user.rows_per_chunk}")
    print(f"to_item sorted_combine={bg.to_item.sorted_combine} "
          f"r_c={bg.to_item.rows_per_chunk}", flush=True)
    stages = {}
    dt = stages["to_user_full_segsum"] = timed(
        "to_user FULL segsum", seg_full, bg.to_user, i32)
    print(f"   -> {e/dt/1e6:.0f}M rows/s")
    dt_g = stages["to_user_gather_multiply_only"] = timed(
        "to_user gather+multiply only", seg_gather_only, bg.to_user, i32)
    print(f"   -> {e/dt_g/1e6:.0f}M rows/s")
    dt_c = stages["to_user_gather_contract_no_scatter"] = timed(
        "to_user gather+contract (no scatter)", seg_no_scatter, bg.to_user, i32)

    # --- to_item (src-sliced gather from 1.37M users, scatter to 105k items)
    dt = stages["to_item_full_segsum_srcsliced"] = timed(
        "to_item FULL segsum", seg_full, bg.to_item, u32)
    print(f"   -> {e/dt/1e6:.0f}M rows/s")
    c_i, r_ci = bg.to_item.src.shape[0], bg.to_item.rows_per_chunk
    fake_p = jnp.zeros((c_i, r_ci, DIM), jnp.float32)
    stages["to_item_scatter_only"] = timed(
        "to_item scatter only", scatter_only, bg.to_item.row_ids, fake_p,
        NUM_ITEMS)

    # --- both directions fused + K loop
    f_prop = jax.jit(lambda b, u, i: propagate_blocked(b, u, i))
    dt_p = stages["propagate_both_dirs"] = timed(
        "propagate_blocked (both dirs)", f_prop, bg, u32, i32)

    # PRODUCTION K-loop: lightgcn_propagate_blocked carries the whole-loop
    # self-adjoint VJP (ops/multiscale.py) — backward is ONE forward on the
    # cotangents. The inline unrolled loop (per-iteration VJP chains, the
    # round-4 path) is kept as a comparison row.
    from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
        lightgcn_propagate_blocked,
    )

    f_fwd = jax.jit(lambda b, u, i: lightgcn_propagate_blocked(b, u, i, K))
    dt_f = stages[f"K{K}_forward"] = timed(f"K={K} forward", f_fwd, bg, u32, i32)

    def loss(u, i, b):
        au, ai = lightgcn_propagate_blocked(b, u, i, K)
        return jnp.sum(au[:128] @ ai[:128].T)

    f_vg = jax.jit(lambda u, i, b: jax.value_and_grad(loss, argnums=(0, 1))(u, i, b))
    dt_vg = stages[f"K{K}_value_and_grad_wholeloop_vjp"] = timed("value_and_grad(K-loop + toy head)", f_vg, u32, i32, bg)

    def fwd_inline(b, u, i):
        au, ai = u, i
        for _ in range(K):
            u, i = propagate_blocked(b, u, i)
            au, ai = au + u, ai + i
        return au * (1.0 / (K + 1)), ai * (1.0 / (K + 1))

    def loss_inline(u, i, b):
        au, ai = fwd_inline(b, u, i)
        return jnp.sum(au[:128] @ ai[:128].T)

    f_vg_old = jax.jit(
        lambda u, i, b: jax.value_and_grad(loss_inline, argnums=(0, 1))(u, i, b)
    )
    dt_vg_old = stages[f"K{K}_value_and_grad_periter_vjp"] = timed(
        "value_and_grad(inline loop, per-iter VJP)", f_vg_old, u32, i32, bg
    )
    print(f"whole-loop VJP speedup over per-iter: {dt_vg_old/dt_vg:.2f}x",
          flush=True)
    fwd_rate = e * K * 2 / dt_f
    fb_rate = e * K * 4 / dt_vg
    gather_ceiling = e / dt_g  # rows/s, pure gather+multiply of this pattern
    print(f"\nfwd gathers {e*K*2/1e6:.0f}M -> {fwd_rate/1e6:.0f}M rows/s")
    print(f"fwd+bwd gathers {e*K*4/1e6:.0f}M -> {fb_rate/1e6:.0f}M rows/s")
    print(f"gather-only ceiling {gather_ceiling/1e6:.0f}M rows/s")
    print(f"fraction of gather roofline: fwd {fwd_rate/gather_ceiling:.3f}  "
          f"fwd+bwd {fb_rate/gather_ceiling:.3f}")

    # Merge the at-scale fraction into ROOFLINE.json (VERDICT r2 item 2):
    # numerator = gathers/s sustained by the full fwd+bwd K-loop step at H&M
    # shape; denominator = the measured gather+multiply-only rate of the SAME
    # access pattern on the same chip — the step's own speed-of-light.
    import json
    import os

    roofline = {}
    if os.path.exists("ROOFLINE.json"):
        try:
            with open("ROOFLINE.json") as f:
                roofline = json.load(f)
        except (json.JSONDecodeError, OSError):
            roofline = {}  # truncated artifact from a killed writer
    roofline["fraction_of_gather_roofline_hm"] = {
        "gather_only_rows_per_s": round(gather_ceiling, 1),
        "fwd_Kloop_rows_per_s": round(fwd_rate, 1),
        "fwd_bwd_Kloop_rows_per_s": round(fb_rate, 1),
        "fraction_fwd": round(fwd_rate / gather_ceiling, 4),
        "fraction_fwd_bwd": round(fb_rate / gather_ceiling, 4),
        "note": (
            "numerator counts one row-gather per edge per direction per "
            "K-iteration (x2 for backward); denominator is the measured "
            "gather+multiply-only rate of the identical chunked access "
            "pattern (seg_gather_only) at H&M shape on this chip. "
            "PRODUCTION config (131072-row src slices, scatter combine for "
            "the sliced direction, whole-loop self-adjoint VJP). Absolute "
            "stage times move ~±15% run-to-run with relay weather; the "
            "fraction (same-run numerator/denominator) is stable."
        ),
        "per_stage_ms": {k: round(v * 1e3, 1) for k, v in stages.items()},
        "round5_changes": ROUND5_CHANGES,
    }
    with open("ROOFLINE.json.tmp", "w") as f:
        json.dump(roofline, f, indent=1)
    os.replace("ROOFLINE.json.tmp", "ROOFLINE.json")


if __name__ == "__main__":
    main()
