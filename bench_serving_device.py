"""On-device retrieval kernel comparison: int8 streaming vs f32 paths
(VERDICT r4 item 6).

BENCH_SERVING's p50s time individual ``recommend`` calls through the axon
relay — per-call RTT and host-side work swamp single-digit-ms kernels (the
int8-vs-f32 p95 bands overlap). This bench times the jitted retrieval
steps AMORTIZED on device (30 back-to-back dispatches, one scalar D2H
barrier), exclusion-mask build included, at the H&M 105k catalog / 256-user
request shape — and sweeps the int8 kernel's tile size. Merges a
``device_amortized`` block into BENCH_SERVING.json.

Run on the real TPU.
"""
import json
import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

NUM_ITEMS = 104_547
NUM_USERS = 200_000
DIM = 64
B = 256
K = 12
REPS = 30


def timed(label, fn, *args):
    out = fn(*args)
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jnp.ravel(jax.tree.leaves(out)[0])[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def main():
    from laplace_gnn_recommendation_tpu.ops.topk import (
        apply_exclusion,
        mips_topk,
    )
    from laplace_gnn_recommendation_tpu.ops.topk_pallas import (
        exclusion_mask,
        row_quantize,
        streaming_mips_topk_int8,
        streaming_mips_topk_masked,
    )

    rng = np.random.default_rng(0)
    # pad to the largest swept tile so every tile width divides evenly
    items_padded = -(-NUM_ITEMS // 2048) * 2048
    item = jnp.asarray(rng.normal(size=(items_padded, DIM)).astype(np.float32))
    users = jnp.asarray(rng.normal(size=(B, DIM)).astype(np.float32))
    q_items, scales = row_quantize(item)
    q_items, scales = jax.block_until_ready((q_items, scales))
    # padded per-user exclusion lists (~23 train items each)
    ex = jnp.asarray(rng.integers(0, NUM_ITEMS, (B, 32)).astype(np.int32))
    exc = jnp.asarray(np.full(B, 23, np.int32))

    rows = {}

    @jax.jit
    def f32_xla(u, it, ex_, exc_):
        scores = u @ it.T
        scores = apply_exclusion(scores, ex_, exc_)
        # mask the pad tail like the server does
        tail = jnp.arange(items_padded) >= NUM_ITEMS
        scores = jnp.where(tail[None, :], -jnp.inf, scores)
        return jax.lax.top_k(scores, K)

    rows["f32_xla_materializing_ms"] = timed(
        "f32 XLA materializing (auto path)", f32_xla, users, item, ex, exc
    ) * 1e3

    @jax.jit
    def f32_stream(u, it, ex_, exc_):
        mask = exclusion_mask(items_padded, ex_, exc_)
        tail = (jnp.arange(items_padded) >= NUM_ITEMS).astype(jnp.int8)
        mask = jnp.maximum(mask, tail[None, :])
        return streaming_mips_topk_masked(u, it, mask, K)

    rows["f32_pallas_streaming_ms"] = timed(
        "f32 Pallas streaming", f32_stream, users, item, ex, exc
    ) * 1e3

    from laplace_gnn_recommendation_tpu.ops.topk import mips_topk_int8

    @jax.jit
    def int8_xla(u, qi, sc, ex_, exc_):
        b = u.shape[0]
        tail = jnp.arange(NUM_ITEMS, items_padded, dtype=jnp.int32)
        ex_full = jnp.concatenate(
            [jnp.broadcast_to(tail, (b, tail.shape[0])), ex_], axis=1
        )
        return mips_topk_int8(u, qi, sc, K, ex_full, exc_ + tail.shape[0])

    rows["int8_xla_materializing_ms"] = timed(
        "int8 XLA materializing (server fast path)", int8_xla,
        users, q_items, scales, ex, exc
    ) * 1e3

    for tile in (512, 1024, 2048):
        @partial(jax.jit, static_argnames=())
        def int8_stream(u, qi, sc, ex_, exc_, _tile=tile):
            mask = exclusion_mask(items_padded, ex_, exc_)
            tail = (jnp.arange(items_padded) >= NUM_ITEMS).astype(jnp.int8)
            mask = jnp.maximum(mask, tail[None, :])
            return streaming_mips_topk_int8(
                u, qi, sc, K, excl_mask=mask, tile=_tile
            )

        dt = timed(f"int8 Pallas streaming tile={tile}", int8_stream,
                   users, q_items, scales, ex, exc)
        rows[f"int8_pallas_tile{tile}_ms"] = dt * 1e3

    # agreement check at the winning tile
    v_f, i_f = jax.block_until_ready(f32_xla(users, item, ex, exc))
    v_q, i_q = jax.block_until_ready(
        jax.jit(lambda u, qi, sc, e_, c_: streaming_mips_topk_int8(
            u, qi, sc, K,
            excl_mask=jnp.maximum(
                exclusion_mask(items_padded, e_, c_),
                (jnp.arange(items_padded) >= NUM_ITEMS).astype(jnp.int8)[None, :],
            ),
        ))(users, q_items, scales, ex, exc)
    )
    agree = float(
        np.mean([
            len(set(np.asarray(i_f)[r]) & set(np.asarray(i_q)[r])) / K
            for r in range(B)
        ])
    )
    rows["top12_agreement"] = round(agree, 4)
    rows["note"] = (
        "amortized device dispatch (30 reps, one D2H), exclusion-mask build "
        "included; BENCH_SERVING p50s additionally carry per-call relay RTT "
        "and host-side id mapping, which dominates at this kernel scale"
    )
    rows = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in rows.items()}
    print(rows)

    bench = {}
    if os.path.exists("BENCH_SERVING.json"):
        try:
            bench = json.load(open("BENCH_SERVING.json"))
        except (json.JSONDecodeError, OSError):
            bench = {}
    bench["device_amortized"] = rows
    with open("BENCH_SERVING.json.tmp", "w") as f:
        json.dump(bench, f, indent=1)
    os.replace("BENCH_SERVING.json.tmp", "BENCH_SERVING.json")
    print("BENCH_SERVING.json updated")


if __name__ == "__main__":
    main()
