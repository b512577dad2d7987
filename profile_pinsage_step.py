"""Decompose the PinSAGE device train step at the full H&M catalog
(VERDICT r4 item 5): BENCH_PINSAGE's 4,392 triples/s at b512 serializes
host sampling with the device step and counts upload on the critical path —
nobody has shown what the device work actually costs. Times sample-only /
upload-only / device-step-only / serialized / prefetch-overlapped, sweeps
the batch size, and merges a ``pinsage_step`` block into ROOFLINE.json.

Run on the real TPU: ``python profile_pinsage_step.py``.
"""
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench_pinsage import HIDDEN, NUM_ITEMS, NUM_USERS, build
from laplace_gnn_recommendation_tpu.data.pinsage_data import PinSAGESampler
from laplace_gnn_recommendation_tpu.models import pinsage as M

REPS = 20


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[0])


def main():
    data = build()
    item_features = jnp.asarray(data.item_features)
    params = M.init_pinsage_params(
        jax.random.PRNGKey(0), data.num_items,
        [int(c) for c in data.item_features.max(axis=0)], HIDDEN, 2,
    )
    tx = optax.adam(3e-4)

    results = {"batch_sweep": {}}
    for batch_size in (512, 2048, 8192):
        sampler = PinSAGESampler(
            data, batch_size=batch_size, num_neighbors=3, seed=2
        )
        opt_state = tx.init(params)

        @jax.jit
        def step_nodonate(p, o, b_, k):
            def loss_fn(pp):
                return M.margin_loss(pp, b_, item_features, None, train=True, rng=k)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o2 = tx.update(grads, o)
            return optax.apply_updates(p, updates), o2, loss

        key = jax.random.PRNGKey(1)

        # host sample only
        sampler.sample_train_batch()
        t0 = time.perf_counter()
        n_s = 10
        batches = [sampler.sample_train_batch() for _ in range(n_s)]
        dt_sample = (time.perf_counter() - t0) / n_s

        # upload only (device_put of a host batch + completion barrier)
        up = jax.device_put(batches[0])
        _sync(up)
        t0 = time.perf_counter()
        for b_ in batches:
            up = jax.device_put(b_)
            _sync(up)
        dt_upload = (time.perf_counter() - t0) / n_s

        # device step on a RESIDENT batch
        b_dev = jax.device_put(batches[0])
        _sync(b_dev)
        p2, o2, loss = step_nodonate(params, opt_state, b_dev, key)
        float(loss)
        t0 = time.perf_counter()
        for i in range(REPS):
            p2, o2, loss = step_nodonate(params, opt_state, b_dev, jax.random.fold_in(key, i))
        float(loss)
        dt_step = (time.perf_counter() - t0) / REPS

        # serialized sample+upload+step (the old bench's loop shape)
        t0 = time.perf_counter()
        for i in range(n_s):
            b_ = sampler.sample_train_batch()
            p2, o2, loss = step_nodonate(params, opt_state, b_, jax.random.fold_in(key, i))
        float(loss)
        dt_serial = (time.perf_counter() - t0) / n_s

        # prefetch-overlapped (sampler thread + async device_put transform)
        from laplace_gnn_recommendation_tpu.data.prefetch import prefetch

        def gen(n):
            made = 0
            while made < n:
                b = sampler.sample_train_batch()
                if b is None:
                    continue
                made += 1
                yield b

        n_o = 30
        feed = prefetch(gen(n_o + 3), buffer_size=3, transform=jax.device_put)
        b_ = next(feed)
        p2, o2, loss = step_nodonate(params, opt_state, b_, key)
        float(loss)
        t0 = time.perf_counter()
        cnt = 0
        for b_ in feed:
            p2, o2, loss = step_nodonate(params, opt_state, b_, jax.random.fold_in(key, cnt))
            cnt += 1
            if cnt == n_o:
                break
        float(loss)
        dt_overlap = (time.perf_counter() - t0) / cnt

        row = {
            "sample_ms": round(dt_sample * 1e3, 2),
            "upload_ms": round(dt_upload * 1e3, 2),
            "device_step_ms": round(dt_step * 1e3, 2),
            "serialized_ms": round(dt_serial * 1e3, 2),
            "overlapped_ms": round(dt_overlap * 1e3, 2),
            "triples_per_sec_overlapped": round(batch_size / dt_overlap, 1),
            "triples_per_sec_serialized": round(batch_size / dt_serial, 1),
        }
        results["batch_sweep"][str(batch_size)] = row
        print(batch_size, row, flush=True)

    roofline = {}
    if os.path.exists("ROOFLINE.json"):
        try:
            with open("ROOFLINE.json") as f:
                roofline = json.load(f)
        except (json.JSONDecodeError, OSError):
            roofline = {}
    roofline["pinsage_step"] = results
    with open("ROOFLINE.json.tmp", "w") as f:
        json.dump(roofline, f, indent=1)
    os.replace("ROOFLINE.json.tmp", "ROOFLINE.json")
    print("ROOFLINE.json updated")


if __name__ == "__main__":
    main()
