"""Kernel-level speed-of-light report.

Times each hot kernel at ML-1M/H&M-representative shapes and reports
achieved bandwidth/FLOPs as a fraction of the chip's roofline
(``utils/profiling.Roofline``). Prints one JSON line summarizing the
fraction-of-peak for the binding resource of each kernel, plus a human
table on stderr.
"""
import json
import os
import sys
import time

import numpy as np


def _sync(r):
    """Real execution barrier: D2H one scalar of EVERY result leaf.

    On the axon relay ``block_until_ready`` is NOT a completion barrier for
    Pallas-kernel outputs until the process has done its first
    device→host transfer (measured: a streaming-topk 'completes' in 0.03 ms
    pre-D2H and 8.3 ms post-D2H — the former is fire-and-forget). A scalar
    download forces true completion of everything it depends on; every
    leaf is barriered because independent outputs (e.g. the two pallas
    calls of propagate) do not depend on each other."""
    import jax

    for leaf in jax.tree_util.tree_leaves(r):
        np.asarray(leaf[(0,) * leaf.ndim])


def timeit(f, n=10, loops=4):
    """Min over several loop-amortized runs, each loop closed by a scalar
    D2H barrier (see ``_sync``). Loop amortization factors out the
    remote-tunnel round-trip latency; the min over loops drops stall
    outliers."""
    r = f()
    _sync(r)
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f()
        _sync(r)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
    from laplace_gnn_recommendation_tpu.data.synthetic import movielens_like_edges
    from laplace_gnn_recommendation_tpu.ops.spmm import propagate_bipartite
    from laplace_gnn_recommendation_tpu.ops.spmm_blocked import (
        BlockedGraph,
        propagate_blocked,
    )
    from laplace_gnn_recommendation_tpu.ops.spmm_dense import (
        DenseAdjacency,
        propagate_dense,
    )
    from laplace_gnn_recommendation_tpu.ops.spmm_pallas import (
        PallasGraph,
        propagate_pallas,
    )
    from laplace_gnn_recommendation_tpu.ops.topk_pallas import streaming_mips_topk
    from laplace_gnn_recommendation_tpu.utils.profiling import Roofline

    # Measured practical ceilings for this chip (see round-1 profiling):
    peak_bytes = 260e9
    peak_flops = 394e12

    eu, ei, U, I = movielens_like_edges(seed=0, scale=1.0)
    g = BipartiteGraph.from_edges(eu, ei, U, I)
    E = g.num_edges
    D = 32
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.normal(size=(U, D)).astype(np.float32))
    xi = jnp.asarray(rng.normal(size=(I, D)).astype(np.float32))

    rows = []

    # NOTE: every jitted bench fn takes its operands as ARGUMENTS. Jitting a
    # closure over large device constants embeds them in the executable,
    # which on the axon relay permanently degrades later Pallas kernel
    # launches ~100× (measured: a closure-jit propagate slows an unrelated
    # streaming-topk call from 0.2ms to 36ms; the args form does not).
    dense = DenseAdjacency.from_graph(g)
    f = jax.jit(propagate_dense)
    t = timeit(lambda: f(dense, xu, xi))
    rows.append(Roofline(
        name="dense_propagate", seconds=t,
        flops=2 * 2 * U * I * D,                      # both directions
        bytes_moved=2 * U * I * 2,                    # A and A^T bf16 reads
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    ))

    bg = BlockedGraph.from_host_edges(eu, ei, U, I)
    fb = jax.jit(propagate_blocked)
    t = timeit(lambda: fb(bg, xu, xi))
    c1 = bg.to_user.src.size
    c2 = bg.to_item.src.size
    rows.append(Roofline(
        name="blocked_segsum", seconds=t,
        flops=2 * (c1 + c2) * 8 * D,                  # onehot contractions
        bytes_moved=(c1 + c2) * (D * 4 + 12),         # msg gather + plan arrays
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    ))

    fp = jax.jit(propagate_bipartite)
    t = timeit(lambda: fp(g, xu, xi))
    rows.append(Roofline(
        name="plain_segsum", seconds=t,
        flops=2 * 2 * E * D,
        bytes_moved=2 * E * (2 * D * 4 + 8),
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    ))

    pg = PallasGraph.from_host_edges(eu, ei, U, I)
    fpl = jax.jit(propagate_pallas)
    t = timeit(lambda: fpl(pg, xu, xi))
    e_pal = pg.to_user.src.size + pg.to_item.src.size
    rows.append(Roofline(
        name="pallas_segsum", seconds=t,
        flops=2 * e_pal * 128 * D,                    # in-kernel onehot MXU
        bytes_moved=e_pal * (3 * D * 4 + 12),         # gather w+r, tile read
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    ))

    # The binding resource of every sparse path: the XLA row gather runs at
    # a fixed per-row rate (~300M rows/s on this chip) independent of index
    # locality and of row width ≤256B. blocked_segsum sits on this floor.
    idx = jnp.asarray(
        np.random.default_rng(1).integers(0, I, E).astype(np.int32)
    )
    fg = jax.jit(lambda table, ids: table[ids])
    t = timeit(lambda: fg(xi, idx))
    rows.append(Roofline(
        name="row_gather_floor", seconds=t,
        flops=0,
        bytes_moved=2 * E * D * 4,
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    ))

    B, Dq, Iq = 256, 64, 104448
    uq = jnp.asarray(rng.normal(size=(B, Dq)).astype(np.float32))
    iq = jnp.asarray(rng.normal(size=(Iq, Dq)).astype(np.float32))
    f = lambda: streaming_mips_topk(uq, iq, 12, tile=512)
    t = timeit(f)
    rows.append(Roofline(
        name="streaming_topk", seconds=t,
        flops=2 * B * Iq * Dq,
        bytes_moved=Iq * Dq * 4,                      # item table streamed once
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    ))

    # ---- full train step MFU (the BASELINE.md deliverable) ---------------
    # ML-1M shape, dense MXU path (what select_propagation picks there).
    from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
    from laplace_gnn_recommendation_tpu.models.lightgcn import init_lightgcn
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import (
        make_train_step,
    )

    K, BATCH = 4, 2048
    cfg = LightGCNConfig(
        hidden_layer_size=D, num_iterations=K, batch_size=BATCH
    )
    params = init_lightgcn(jax.random.PRNGKey(0), U, I, D)
    max_deg = int(np.asarray(g.user_deg).max())
    step, tx = make_train_step(cfg, g, max_deg, prop_graph=dense)
    opt_state = tx.init(params)
    keys = jax.random.split(jax.random.PRNGKey(1), 64)
    ki = [0]

    def run_step():
        nonlocal_params = run_step.state
        p, o, loss = step(*nonlocal_params, keys[ki[0] % 64])
        ki[0] += 1
        run_step.state = (p, o)
        return loss

    run_step.state = (params, opt_state)
    t = timeit(run_step, n=10, loops=3)
    # dense-path matmul FLOPs: K iterations × 2 directions × 2·U·I·D each,
    # forward + one transposed matmul per fwd matmul in backward ≈ 2×.
    step_flops = 2 * (K * 2 * 2 * U * I * D)
    mfu = step_flops / t / peak_flops
    step_roofline = Roofline(
        name="train_step", seconds=t, flops=step_flops,
        bytes_moved=2 * K * 2 * U * I * 2,
        peak_flops=peak_flops, peak_bytes=peak_bytes,
    )
    print(step_roofline.report() + f", MFU={100*mfu:.1f}%", file=sys.stderr)

    summary = {}
    for r in rows:
        print(r.report(), file=sys.stderr)
        summary[r.name] = round(r.fraction_of_peak, 4)
    worst = min(summary.values())

    # persistent speed-of-light artifact (BASELINE.md: "lookup /
    # message-passing / scoring kernels profiled at speed-of-light").
    # MERGED into the existing file — profile_hm_step.py owns the
    # fraction_of_gather_roofline_hm block and must survive this writer
    # (round-3 lost it to a blind overwrite here)
    roofline = {}
    if os.path.exists("ROOFLINE.json"):
        try:
            with open("ROOFLINE.json") as fjson:
                roofline = json.load(fjson)
        except (json.JSONDecodeError, OSError):
            roofline = {}  # truncated artifact from a killed writer
    roofline |= {
        "peaks": {
            "flops_bf16": peak_flops,
            "hbm_bytes_per_s_practical": peak_bytes,
            "note": (
                "819 GB/s is v5e's nominal HBM peak; 260 GB/s is the "
                "measured practical stream ceiling on this chip through "
                "the relay (round-1 profiling) and is what fractions are "
                "scored against"
            ),
        },
        "caveats": {
            "small_kernels": (
                "ML-1M-scale kernels finish in single-digit ms; through "
                "the remote-device relay their wall time is dominated by "
                "dispatch latency, so their fraction-of-peak UNDERSTATES "
                "the kernels (e.g. dense_propagate's matmuls are ~7 us of "
                "MXU work). The load-bearing at-scale numbers are "
                "BENCH_HM.json and train_step_mfu below."
            ),
            "streaming_topk": (
                "classified memory-bound by arithmetic intensity, but its "
                "real bottleneck is the VPU top-k fold (measured at "
                "parity with the f32 XLA path; its value is avoiding the "
                "[B, I] scores materialization, not bandwidth)"
            ),
        },
        "kernels": {
            r.name: {
                "seconds": r.seconds,
                "achieved_tflops": r.achieved_flops / 1e12,
                "achieved_gbps": r.achieved_bandwidth / 1e9,
                "arithmetic_intensity": r.arithmetic_intensity,
                "bound": r.bound,
                "fraction_of_peak": r.fraction_of_peak,
            }
            for r in rows + [step_roofline]
        },
        "train_step_mfu": mfu,
    }
    with open("ROOFLINE.json.tmp", "w") as fjson:
        json.dump(roofline, fjson, indent=1)
    os.replace("ROOFLINE.json.tmp", "ROOFLINE.json")

    print(json.dumps({
        "metric": "kernel_fraction_of_peak_min",
        "value": worst,
        "unit": "fraction",
        "vs_baseline": None,
        "kernels": summary,
        "train_step_mfu": round(mfu, 4),
    }))


if __name__ == "__main__":
    main()
