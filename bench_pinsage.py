"""PinSAGE sampling benchmark: random-walk throughput + block assembly.

Prints one JSON line: sampled walks/sec through the native
random-walk-importance frontier kernel (``native/sampler.cpp:
pinsage_frontier`` — the ``dgl.sampling.PinSAGESampler`` replacement) on an
H&M-shaped train graph. ``vs_baseline`` is against the pure-Python frontier
(the same algorithm the reference's DGL C kernel replaces, run per-walk in
Python — the honest stand-in available without DGL in this image).

A walk = one seed's ``walk_length`` item→user→item traversal; the sampler
runs ``num_random_walks`` of them per seed per layer.
"""
import json
import os
import time

import numpy as np

from laplace_gnn_recommendation_tpu.data.graph import HostCSR
from laplace_gnn_recommendation_tpu.data.pinsage_data import (
    PinSAGEData,
    PinSAGESampler,
)
from laplace_gnn_recommendation_tpu.data.synthetic import random_bipartite_edges

# full H&M shape (VERDICT r2 item 4): the whole 105k-article catalog with
# the 1.37M-customer interaction graph feeding the walks
NUM_USERS, NUM_ITEMS, AVG_DEG = 1_371_980, 104_547, 23
WALK_LEN, NUM_WALKS, NUM_NEIGHBORS = 2, 10, 3
HIDDEN = 64


def build():
    import os

    cache = f"/tmp/hm_edges_pl_{NUM_USERS}_{NUM_ITEMS}_{AVG_DEG}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        eu, ei = z["eu"], z["ei"]
    else:
        eu, ei = random_bipartite_edges(
            seed=0, num_users=NUM_USERS, num_items=NUM_ITEMS,
            avg_degree=AVG_DEG, popularity_alpha=0.8,
        )
        np.savez(cache, eu=eu, ei=ei)
    return PinSAGEData(
        num_users=NUM_USERS, num_items=NUM_ITEMS,
        user_csr=HostCSR.from_edges(eu, ei, NUM_USERS, NUM_ITEMS),
        item_csr=HostCSR.from_edges(ei, eu, NUM_ITEMS, NUM_USERS),
        item_features=np.zeros((NUM_ITEMS, 1), np.int32),
        item_features_float=None,
        latest_item_per_user=np.zeros(NUM_USERS, np.int32),
        val_items=[], test_items=[],
    )


def run(data, native: bool, n_batches: int, batch: int = 512) -> float:
    s = PinSAGESampler(
        data, random_walk_length=WALK_LEN, num_random_walks=NUM_WALKS,
        num_neighbors=NUM_NEIGHBORS, batch_size=batch, seed=1,
        use_native=native,
    )
    rng = np.random.default_rng(0)
    seeds = rng.integers(0, NUM_ITEMS, batch)
    s.neighbor_frontier(seeds)  # warmup
    walks = 0
    t0 = time.perf_counter()
    for _ in range(n_batches):
        s.neighbor_frontier(rng.integers(0, NUM_ITEMS, batch))
        walks += batch * NUM_WALKS
    return walks / (time.perf_counter() - t0)


def bench_train_step(data, sampler, batch: int = 512, steps: int = 10):
    """Device train-step rate at the full catalog (margin loss over the
    105k-item table — the pipeline's exact step math)."""
    import jax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from laplace_gnn_recommendation_tpu.models import pinsage as M

    item_features = jnp.asarray(data.item_features)
    params = M.init_pinsage_params(
        jax.random.PRNGKey(0), data.num_items,
        [int(c) for c in data.item_features.max(axis=0)], HIDDEN, 2,
    )
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch_, k):
        def loss_fn(p):
            return M.margin_loss(p, batch_, item_features, None, train=True, rng=k)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    b = sampler.sample_train_batch()
    params, opt_state, loss = step(params, opt_state, b, key)
    float(loss)  # compile barrier
    # prefetch-overlapped host sampling + async upload — the production
    # pipeline loop since round 5 (pinsage_pipeline.train); the old
    # serialized loop left the device idle through each sample+upload
    from laplace_gnn_recommendation_tpu.data.prefetch import prefetch

    def gen(n):
        made = 0
        while made < n:
            bb = sampler.sample_train_batch()
            if bb is not None:
                made += 1
                yield bb

    t0 = time.perf_counter()
    i = 0
    for b in prefetch(gen(steps), buffer_size=2, transform=jax.device_put):
        params, opt_state, loss = step(params, opt_state, b, jax.random.fold_in(key, i))
        i += 1
    float(loss)
    dt = time.perf_counter() - t0
    return steps * batch / dt  # (head, tail, neg) triples per second


def main():
    data = build()
    fast = run(data, native=True, n_batches=40)
    slow = run(data, native=False, n_batches=2)
    # block-assembly rate through the full sample_train_batch path
    s = PinSAGESampler(data, batch_size=512, num_neighbors=NUM_NEIGHBORS, seed=2)
    s.sample_train_batch()
    t0 = time.perf_counter()
    n_asm = 20
    for _ in range(n_asm):
        s.sample_train_batch()
    batches_per_s = n_asm / (time.perf_counter() - t0)
    triples_per_s = bench_train_step(data, s)
    s_big = PinSAGESampler(
        data, batch_size=8192, num_neighbors=NUM_NEIGHBORS, seed=3
    )
    triples_per_s_b8192 = bench_train_step(data, s_big, batch=8192, steps=6)
    result = {
        "metric": "pinsage_walks_per_sec_full_catalog",
        "value": round(fast, 1),
        "unit": "walks/s",
        "vs_baseline": round(fast / slow, 2),
        "scale": {"num_users": NUM_USERS, "num_items": NUM_ITEMS},
        "train_batches_per_sec_b512": round(batches_per_s, 2),
        "train_triples_per_sec_b512": round(triples_per_s, 1),
        "train_triples_per_sec_b8192": round(triples_per_s_b8192, 1),
    }
    print(json.dumps(result))
    # preserve the quality block bench_pinsage_train.py merges in
    out_path = os.path.join(os.path.dirname(__file__), "BENCH_PINSAGE.json")
    prev = {}
    if os.path.exists(out_path):
        try:
            prev = json.load(open(out_path))
        except (json.JSONDecodeError, OSError):
            prev = {}
    if "train" in prev:
        result["train"] = prev["train"]
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
