"""Full-catalog top-k scoring (MIPS) with exclusion masking — single-chip and
sharded.

Replaces the reference's per-user CPU loop ``u @ Iᵀ → topk → set-difference``
(``utils/metrics_lightgcn.py:125-142``) and the eval-side exclusion masking
(``utils/metrics_encoder_decoder.py:58-72``).

Exclusion semantics: the reference first takes ``topk(k + |excluded|)`` and
removes excluded ids (``utils/metrics_lightgcn.py:139-142``); masking the
excluded scores to a large negative value *before* one ``topk(k)`` yields the
identical result in one pass — that is what we do, using the reference's own
mask constant ``-(1 << 10)`` (``utils/metrics_encoder_decoder.py:69``).

Sharded path: the item table is row-sharded over the ``model`` mesh axis.
Each shard computes its local [B, I/p] score block on the MXU and its local
top-k; the k·p candidates are all-gathered over ICI and merged with one more
top-k. Communication is O(B·k·p) instead of O(B·I) — the standard distributed
MIPS recipe.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import MODEL_AXIS

EXCLUDE_FILL = -(1 << 10)  # reference utils/metrics_encoder_decoder.py:69


def apply_exclusion(
    scores: jnp.ndarray,        # [B, I]
    exclude_items: jnp.ndarray,  # int32 [B, X] padded with >= I (or use count)
    exclude_count: Optional[jnp.ndarray] = None,  # int32 [B]
    fill: float = EXCLUDE_FILL,
) -> jnp.ndarray:
    """Set ``scores[b, exclude_items[b, j]] = fill`` for valid j.

    Pad slots are routed out of bounds and dropped by the scatter.
    """
    b, num_items = scores.shape
    x = exclude_items.shape[1]
    # pad slots are negative (-1 convention of padded_user_items) and/or
    # beyond exclude_count; route both out of bounds so the scatter drops
    # them — negative ids must never wrap to the last column
    valid = exclude_items >= 0
    if exclude_count is not None:
        valid &= jnp.arange(x)[None, :] < exclude_count[:, None]
    cols = jnp.where(valid, exclude_items, num_items)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, x))
    return scores.at[rows, cols].set(fill, mode="drop")


def hierarchical_topk(
    scores: jnp.ndarray, k: int, group: int = 256
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k over the last axis via a two-stage group reduction.

    Stage 1 reduces [B, I] to per-group maxima [B, I/group] (one cheap max
    pass) and top-k's THOSE to find the k winning groups; stage 2 gathers
    only the winners' columns ([B, k·group]) and top-k's that small block.
    Exactness: the true top-k elements occupy at most k distinct groups,
    and every such group's maximum is itself ≥ the k-th overall value, so
    no winning group can rank below the k selected ones — the candidate
    block provably contains a full top-k set. Returned VALUES are identical
    to ``jax.lax.top_k``; ids may differ only between equal-valued ties.

    Measured (v5e, f32, D2H-barriered, relay overhead subtracted): ~1.4×
    over ``lax.top_k`` at [256, 522k] and [1024, 104k] — the full-width
    sort-based top-k is the eval/serving bottleneck after the score matmul.

    Falls back to ``lax.top_k`` when I isn't divisible by a usable group
    size or there are fewer than k groups.

    Unaligned item counts are column-padded with -inf up to the group
    multiple first (real catalogs are rarely 256-aligned — H&M's 104,547
    items otherwise fell through to the full [B, I] sort, which dominates
    eval at that scale). Pad columns can never win a slot while any finite
    score remains.
    """
    b, i = scores.shape
    if i % group != 0 and i > group * max(k, 1):
        i_pad = -(-i // group) * group
        scores = jnp.pad(
            scores, ((0, 0), (0, i_pad - i)), constant_values=-jnp.inf
        )
        i = i_pad
    for tg in (group, 128):
        if i % tg == 0 and i // tg >= k and tg > k:
            g = i // tg
            s3 = scores.reshape(b, g, tg)
            gmax = s3.max(axis=2)
            _, gidx = jax.lax.top_k(gmax, k)                     # [B, k]
            cand = jnp.take_along_axis(
                s3, gidx[:, :, None], axis=1
            ).reshape(b, k * tg)
            vals, pos = jax.lax.top_k(cand, k)
            grp = jnp.take_along_axis(gidx, pos // tg, axis=1)
            return vals, grp * tg + pos % tg
    return jax.lax.top_k(scores, k)


def masked_topk(
    scores: jnp.ndarray,
    k: int,
    exclude_items: Optional[jnp.ndarray] = None,
    exclude_count: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """top-k over the item axis after exclusion masking."""
    if exclude_items is not None:
        scores = apply_exclusion(scores, exclude_items, exclude_count)
    return hierarchical_topk(scores, k)


def mips_topk(
    user_emb: jnp.ndarray,   # [B, D]
    item_emb: jnp.ndarray,   # [I, D]
    k: int,
    exclude_items: Optional[jnp.ndarray] = None,
    exclude_count: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-device maximum-inner-product top-k: one [B,D]×[D,I] matmul on
    the MXU + masked top-k. Returns (values, item_ids)."""
    scores = jnp.dot(user_emb, item_emb.T, preferred_element_type=jnp.float32)
    return masked_topk(scores, k, exclude_items, exclude_count)


# Scores-matrix size above which the materializing path's [B, I] f32
# intermediate is worth avoiding. Measured on v5e (D=64, k=12, true D2H
# barrier — block_until_ready alone is NOT a completion barrier for Pallas
# outputs on the axon relay, which made earlier streaming numbers look 40×
# better than reality): XLA materializing beats the streaming kernel at
# every shape that fits comfortably (7.3 vs 12.5 ms @ B=256, I=104k;
# 15.2 vs 40.6 ms @ B=256, I=524k; parity at B=32), because the streaming
# fold is VPU-bound. Streaming's real value is MEMORY: no [B, I] f32
# intermediate, so it serves huge-catalog × large-batch sweeps the XLA
# path would blow HBM on. The fold also VMEM-OOMs above B≈512.
SCORES_BYTES_BUDGET = 512 << 20
STREAMING_MAX_BATCH = 512


def mips_topk_int8(
    user_emb: jnp.ndarray,     # f32 [B, D]
    q_items: jnp.ndarray,      # int8 [I, D] (topk_pallas.row_quantize)
    item_scales: jnp.ndarray,  # f32 [1, I]
    k: int,
    exclude_items: Optional[jnp.ndarray] = None,
    exclude_count: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materializing retrieval over an int8 catalog: int8×int8 MXU scoring
    (users row-quantized on the fly), dequantize, masked hierarchical
    top-k. The quantized tier's FAST path wherever the [B, I] scores matrix
    fits — on-device measurement (BENCH_SERVING device_amortized) shows
    retrieval at serving shapes is scores/top-k bound, not catalog-
    bandwidth bound, so the materializing form beats the streaming fold
    ~2.3× while the int8 catalog still cuts HBM capacity 4×."""
    from .topk_pallas import row_quantize

    qu, su = row_quantize(user_emb)
    raw = jax.lax.dot_general(
        qu, q_items,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * su.reshape(-1, 1) * item_scales
    return masked_topk(scores, k, exclude_items, exclude_count)


def auto_mips_topk(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    k: int,
    exclude_items: Optional[jnp.ndarray] = None,
    exclude_count: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Retrieval entry point: the materializing XLA path by default (it is
    the fastest measured option wherever its [B, I] scores matrix fits);
    the Pallas streaming kernel when that intermediate would exceed
    ``SCORES_BYTES_BUDGET`` (memory-bound serving sweeps)."""
    num_items = item_emb.shape[0]
    b = user_emb.shape[0]
    tile = 512
    if (
        jax.default_backend() == "tpu"
        and num_items % tile == 0
        and b <= STREAMING_MAX_BATCH
        and b * num_items * 4 > SCORES_BYTES_BUDGET
    ):
        from .topk_pallas import (
            exclusion_mask,
            streaming_mips_topk,
            streaming_mips_topk_masked,
        )

        if exclude_items is None:
            return streaming_mips_topk(user_emb, item_emb, k, tile=tile)
        mask = exclusion_mask(num_items, exclude_items, exclude_count)
        return streaming_mips_topk_masked(user_emb, item_emb, mask, k, tile=tile)
    return mips_topk(user_emb, item_emb, k, exclude_items, exclude_count)


def sharded_mips_topk(
    mesh: Mesh,
    user_emb: jnp.ndarray,   # [B, D] replicated over model axis
    item_emb: jnp.ndarray,   # [I, D], I divisible by model-axis size
    k: int,
    exclude_items: Optional[jnp.ndarray] = None,  # global ids, [B, X]
    exclude_count: Optional[jnp.ndarray] = None,
    num_valid_items: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed MIPS top-k: per-shard score+topk, all-gather merge.

    Works on a 1-device mesh too (degenerates to ``mips_topk``).

    ``num_valid_items`` (static) masks the catalog tail: columns with global
    id ≥ it score ``EXCLUDE_FILL`` and never win. Production callers pad the
    item table so its rows divide the model axis (``shard_rows_pad``); the
    dead pad rows must not be recommendable.
    """
    parts = mesh.shape[MODEL_AXIS]
    num_items = item_emb.shape[0]
    assert num_items % parts == 0, (num_items, parts)
    shard_items = num_items // parts
    if num_valid_items is not None and num_valid_items >= num_items:
        num_valid_items = None

    has_excl = exclude_items is not None
    if exclude_count is None and has_excl:
        exclude_count = jnp.full((user_emb.shape[0],), exclude_items.shape[1], jnp.int32)

    def local_fn(u, it, ex_items, ex_count):
        # my shard index along the model axis
        my = jax.lax.axis_index(MODEL_AXIS)
        offset = my * shard_items
        scores = jnp.dot(u, it.T, preferred_element_type=jnp.float32)
        if num_valid_items is not None:
            # pad-tail columns mask to -inf, NOT EXCLUDE_FILL: user
            # exclusions may legitimately fill a row's top-k with
            # EXCLUDE_FILL ties, and an out-of-catalog pad id must never
            # win one of those slots (ids ≥ num_valid_items don't exist)
            col_global = offset + jnp.arange(shard_items)
            scores = jnp.where(
                (col_global < num_valid_items)[None, :], scores, -jnp.inf
            )
        if has_excl:
            local_ids = ex_items - offset
            in_range = (local_ids >= 0) & (local_ids < shard_items)
            if ex_count is not None:
                in_range &= (
                    jnp.arange(ex_items.shape[1])[None, :] < ex_count[:, None]
                )
            cols = jnp.where(in_range, local_ids, shard_items)
            rows = jnp.broadcast_to(
                jnp.arange(u.shape[0])[:, None], ex_items.shape
            )
            scores = scores.at[rows, cols].set(EXCLUDE_FILL, mode="drop")
        vals, idx = hierarchical_topk(scores, min(k, shard_items))
        idx = idx + offset
        # gather the k candidates from every shard: [B, k*parts]
        vals_all = jax.lax.all_gather(vals, MODEL_AXIS, axis=1, tiled=True)
        idx_all = jax.lax.all_gather(idx, MODEL_AXIS, axis=1, tiled=True)
        mvals, mpos = jax.lax.top_k(vals_all, k)
        midx = jnp.take_along_axis(idx_all, mpos, axis=1)
        if num_valid_items is not None:
            # a row with < k unmasked items can still surface -inf slots;
            # clamp their ids into the catalog (same garbage-but-valid
            # class the reference's over-excluded rows produce)
            midx = jnp.where(jnp.isfinite(mvals), midx, 0)
        return mvals, midx

    in_specs = (
        P(None, None),            # user_emb replicated
        P(MODEL_AXIS, None),      # item rows sharded
        P(None, None) if has_excl else P(),
        P(None) if has_excl else P(),
    )
    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=in_specs,
        out_specs=(P(None, None), P(None, None)),
        check_vma=False,
    )
    dummy = jnp.zeros((), jnp.int32)
    return fn(
        user_emb, item_emb,
        exclude_items if has_excl else dummy,
        exclude_count if has_excl else dummy,
    )
