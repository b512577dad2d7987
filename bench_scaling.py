"""Scaling benchmark: DP+TP LightGCN train-step throughput vs device count.

Prints one JSON line with per-device-count steps/s and the scaling
efficiency at the largest count (throughput_N / (N · throughput_1)).

On the single-TPU environment this measures N=1 only (efficiency 1.0 by
definition); run under the virtual CPU mesh to exercise the harness across
N devices:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py

Caveat: virtual CPU devices share the host's physical cores (2 here), so
measured "efficiency" on the CPU mesh is bounded by cores/devices and says
nothing about ICI scaling — the harness exists so the same command produces
the honest number the moment real multi-chip hardware is attached. The
output marks CPU-mesh runs accordingly.
"""
import json
import time

import numpy as np


def main():
    import jax

    from laplace_gnn_recommendation_tpu.configs import LightGCNConfig
    from laplace_gnn_recommendation_tpu.data.graph import BipartiteGraph
    from laplace_gnn_recommendation_tpu.data.synthetic import movielens_like_edges
    from laplace_gnn_recommendation_tpu.models.lightgcn import (
        LightGCNParams,
        init_lightgcn,
    )
    from laplace_gnn_recommendation_tpu.parallel.mesh import (
        MODEL_AXIS,
        build_mesh,
        row_sharding,
    )
    from laplace_gnn_recommendation_tpu.train.lightgcn_pipeline import make_train_step

    eu, ei, num_users, num_items = movielens_like_edges(seed=0, scale=0.25)
    # pad node counts to divide any mesh we try
    num_users = -(-num_users // 8) * 8
    num_items = -(-num_items // 8) * 8
    g = BipartiteGraph.from_edges(eu, ei, num_users, num_items)
    max_deg = int(np.asarray(g.user_deg).max())

    n_dev = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_dev]
    throughput = {}
    for n in counts:
        mesh = build_mesh(n, 1, devices=jax.devices()[:n])
        cfg = LightGCNConfig(
            hidden_layer_size=32, num_iterations=3, batch_size=512 * n,
            dense_bytes_budget=0,  # exercise the sharded segment-sum path
        )
        params = init_lightgcn(jax.random.PRNGKey(0), num_users, num_items, 32)
        if n > 1:
            params = LightGCNParams(
                user_emb=jax.device_put(params.user_emb, row_sharding(mesh)),
                item_emb=jax.device_put(params.item_emb, row_sharding(mesh)),
            )
        step, tx = make_train_step(cfg, g, max_deg, mesh=mesh)
        opt = tx.init(params)
        keys = jax.random.split(jax.random.PRNGKey(1), 12)
        params, opt, loss = step(params, opt, keys[0])
        loss.block_until_ready()
        t0 = time.perf_counter()
        for i in range(10):
            params, opt, loss = step(params, opt, keys[i + 1])
        loss.block_until_ready()
        dt = (time.perf_counter() - t0) / 10
        throughput[n] = cfg.batch_size / dt  # examples/s
    n_max = counts[-1]
    eff = throughput[n_max] / (n_max * throughput[1])
    on_cpu = jax.default_backend() == "cpu"
    print(
        json.dumps(
            {
                "metric": f"dp_scaling_efficiency_{n_max}dev",
                "value": round(eff, 4),
                "unit": "fraction",
                "vs_baseline": round(eff / 0.8, 3),  # target ≥0.8 (real chips)
                "examples_per_sec": {str(k): round(v, 1) for k, v in throughput.items()},
                "virtual_cpu_mesh": on_cpu,
                "projection": project_sharded_efficiency(),
            }
        )
    )


# v5e per-chip one-way ICI bandwidth (public: 1,600 Gbps aggregate
# bidirectional per chip on the 2-D torus → ~100 GB/s usable one-way for a
# ring all-gather; DCN only enters past a pod slice, which 2 hosts of v5e
# never cross).
ICI_BYTES_PER_S = 100e9

# measured single-chip blocked-SpMM train-step time at H&M scale (28M train
# edges, D=32, K=4; see BENCH_HM.json) — the compute term of the projection
HM_STEP_1CHIP_S = 7.6
HM_USERS, HM_ITEMS, HM_DIM, HM_K = 1_371_980, 104_547, 32, 4


def project_sharded_efficiency():
    """Communication-volume scaling model for the sharded LightGCN step
    (the BASELINE.md ≥80%-to-2-hosts deliverable, projected — real
    multi-chip hardware is not attachable here; the op-level harness above
    and the public train() path are what the projection parameterizes).

    Per chip per step on a p-way model axis:
    * compute: the per-chip edge partition is 1/p of the edges, and the
      blocked SpMM is per-edge-gather-bound → t_compute = t_1chip / p.
    * communication: each of the K iterations all-gathers both source
      tables (each chip receives the other shards' rows: (p-1)/p ·
      (U+I)·D·4 bytes) and the backward reverses it as a reduce-scatter of
      equal volume (the VJP of all-gather).
    Efficiency bounds: no-overlap (serial comm) and full-overlap (XLA hides
    collectives under the gather-bound compute — the realistic case, since
    ICI transfers and HBM gathers use different resources).
    """
    table_bytes = (HM_USERS + HM_ITEMS) * HM_DIM * 4
    out = {}
    for p in (2, 4, 8, 16):
        t_comp = HM_STEP_1CHIP_S / p
        recv = (p - 1) / p * table_bytes
        t_comm = HM_K * 2 * recv / ICI_BYTES_PER_S  # fwd AG + bwd RS
        eff_no_overlap = t_comp / (t_comp + t_comm)
        eff_overlap = t_comp / max(t_comp, t_comm)
        out[str(p)] = {
            "t_compute_s": round(t_comp, 4),
            "t_comm_s": round(t_comm, 4),
            "efficiency_no_overlap": round(eff_no_overlap, 4),
            "efficiency_full_overlap": round(min(eff_overlap, 1.0), 4),
        }
    out["assumptions"] = {
        "ici_bytes_per_s_oneway": ICI_BYTES_PER_S,
        "hm_step_1chip_s": HM_STEP_1CHIP_S,
        "note": (
            "gather-bound compute scales 1/p; comm = K fwd all-gathers + "
            "K bwd reduce-scatters of both tables; ≥80% target met with "
            "wide margin at p≤16 even with zero overlap"
        ),
    }
    return out


if __name__ == "__main__":
    main()
