"""Secondary benchmark: host-side subgraph sampling throughput.

Prints one JSON line: sampled edges/sec through the full padded-batch
assembly path (native C++ BFS + batch assembly) on a MovieLens-1M-scale
graph.

``vs_baseline`` is measured against a faithful behavioral port of the
reference's actual sampling hot loop — ``GraphDataset.__getitem__``
(``/root/reference/data/dataset.py:39-293``, pure torch + Python dicts, one
call per user; see ``reference_port_sampler.py``) — run in-process on the
same graph with the same config (batch 24, fanout 64, 3 hops, pos ratio 0.5,
neg ratio 3.0). This closes the BASELINE.md "sampled edges/sec/chip ≥5× the
CPU PyG reference" claim against the reference's own algorithm rather than a
stand-in. The port's dict-assembly cost is counted, as it is in the
reference's DataLoader workers.
"""
import json
import time

import numpy as np

from laplace_gnn_recommendation_tpu.configs import Config
from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.sampler import SubgraphSampler
from laplace_gnn_recommendation_tpu.data.synthetic import movielens_like_edges


_CACHE = {}


def _graph():
    if "graph" not in _CACHE:
        eu, ei, num_users, num_items = movielens_like_edges(seed=0, scale=1.0)
        _CACHE["graph"] = (eu, ei, num_users, num_items)
    return _CACHE["graph"]


def run(native: bool, n_batches: int) -> float:
    eu, ei, num_users, num_items = _graph()
    ucsr = HostCSR.from_edges(eu, ei, num_users, num_items)
    icsr = HostCSR.from_edges(ei, eu, num_items, num_users)
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


def run_reference_port(n_users: int) -> float:
    """The reference's own per-user torch sampler on the same graph/config."""
    import torch as t

    from reference_port_sampler import ReferencePortDataset

    eu, ei, num_users, num_items = _graph()
    users = {}
    articles = {}
    for u, i in zip(eu.tolist(), ei.tolist()):
        users.setdefault(u, []).append(i)
        articles.setdefault(i, []).append(u)
    for u in range(num_users):
        users.setdefault(u, [0])  # reference graphs have no isolated users
    all_edges = t.stack(
        [t.from_numpy(eu.astype(np.int64)), t.from_numpy(ei.astype(np.int64))]
    )
    ds = ReferencePortDataset(
        users, articles, all_edges,
        user_features=t.zeros((num_users, 2), dtype=t.long),
        article_features=t.zeros((num_items, 2), dtype=t.long),
        k=12, positive_edges_ratio=0.5, negative_edges_ratio=3.0,
        n_hop_neighbors=3, num_neighbors=64, train=True,
    )
    rng = np.random.default_rng(0)
    ds[0]  # warmup
    edges = 0
    t0 = time.perf_counter()
    for u in rng.integers(0, num_users, n_users):
        d = ds[int(u)]
        edges += int(d["edge_index"].shape[1])
    return edges / (time.perf_counter() - t0)


def run_store(n_batches: int) -> float:
    """Store-backed sampler (InMemoryGraphStore answering the real Cypher)
    on the same graph/config — the TPU build's analog of the reference's
    per-``__getitem__`` DB round-trip bottleneck (``dataset_neo.py:51-57``).
    The number quantifies the store-path cost the parity tier pays."""
    from laplace_gnn_recommendation_tpu.constants import (
        EDGE_KEY, NODE_ITEM, NODE_USER,
    )
    from laplace_gnn_recommendation_tpu.data.store_sampler import (
        GraphStoreSampler, InMemoryGraphStore,
    )

    eu, ei, num_users, num_items = _graph()
    ucsr = HostCSR.from_edges(eu, ei, num_users, num_items)
    icsr = HostCSR.from_edges(ei, eu, num_items, num_users)
    store = InMemoryGraphStore(
        {NODE_USER: NODE_USER, NODE_ITEM: NODE_ITEM},
        {EDGE_KEY: (eu, ei)},
        {EDGE_KEY: np.zeros(len(eu), np.int64)},  # all TRAIN
    )
    cfg = Config(batch_size=24, num_neighbors=64, n_hop_neighbors=3, k=12)
    s = GraphStoreSampler(
        cfg, store, ucsr, icsr, train=True, split_type="train", seed=1
    )
    rng = np.random.default_rng(0)
    edges = 0
    t0 = time.perf_counter()
    for _ in range(n_batches):
        b = s.sample_batch(rng.integers(0, num_users, 24))
        edges += int(np.asarray(b.edge_mask).sum())
    return edges / (time.perf_counter() - t0)


def main():
    fast = run(native=True, n_batches=20)
    ref = run_reference_port(n_users=48)
    store = run_store(n_batches=2)
    print(
        json.dumps(
            {
                "metric": "sampled_edges_per_sec",
                "value": round(fast, 1),
                "unit": "edges/s",
                "vs_baseline": round(fast / ref, 2),
            }
        )
    )
    print(
        json.dumps(
            {
                "metric": "store_backed_sampled_edges_per_sec",
                "value": round(store, 1),
                "unit": "edges/s",
                "vs_in_process": round(store / fast, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
