"""Secondary benchmark: host-side subgraph sampling throughput.

Prints one JSON line: sampled edges/sec through the full padded-batch
assembly path (native C++ BFS + Python batch assembly) on a MovieLens-1M-
scale graph, vs the pure-Python sampler baseline (the stand-in for the
reference's per-user Python DataLoader sampling, ``data/dataset.py:39-182``).
"""
import json
import time

import numpy as np

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.sampler import SubgraphSampler
from laplace_gnn_recommendation_tpu.data.synthetic import movielens_like_edges


_CACHE = {}


def run(native: bool, n_batches: int) -> float:
    if "graph" not in _CACHE:
        eu, ei, num_users, num_items = movielens_like_edges(seed=0, scale=1.0)
        _CACHE["graph"] = (
            HostCSR.from_edges(eu, ei, num_users, num_items),
            HostCSR.from_edges(ei, eu, num_items, num_users),
            num_users,
        )
    ucsr, icsr, num_users = _CACHE["graph"]
    cfg = Config(batch_size=24, num_neighbors=64, n_hop_neighbors=3, k=12)
    s = SubgraphSampler(cfg, ucsr, icsr, train=True, seed=1, use_native=native)
    s.sample_batch(np.arange(24))  # warmup (device upload path, JIT caches)
    rng = np.random.default_rng(0)
    edges = 0
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = s.sample_batch(rng.integers(0, num_users, 24))
        edges += int(np.asarray(b.edge_mask).sum())
    return edges / (time.perf_counter() - t0)


def main():
    fast = run(native=True, n_batches=20)
    slow = run(native=False, n_batches=5)
    print(
        json.dumps(
            {
                "metric": "sampled_edges_per_sec",
                "value": round(fast, 1),
                "unit": "edges/s",
                "vs_baseline": round(fast / slow, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
