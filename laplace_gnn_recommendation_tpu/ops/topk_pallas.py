"""Streaming MIPS top-k as a Pallas TPU kernel.

The XLA path (``ops/topk.mips_topk``) materializes the full [B, I] score
matrix in HBM before ``top_k`` — at H&M catalog scale (I ≈ 105k) that is
~420 KB per user of pure HBM traffic for k=12 survivors. This kernel streams
item tiles through VMEM: each grid step computes one [B, T] score tile on
the MXU and folds it into a running [B, k] top-k held in VMEM scratch, so
HBM sees only the item table once and k results per user.

Honest measurement (v5e, D=64, k=12, real D2H barrier): the fold is
VPU-bound, so the XLA materializing path is FASTER wherever its scores
matrix fits (7.3 vs 12.5 ms at B=256/I=104k) and this kernel only matches
it at small B. Its role is the memory-constrained regime — [B, I] f32
would blow the budget — which is how ``ops/topk.auto_mips_topk`` now
dispatches. (Round-1 notes claimed 40×; that measurement predates the
discovery that ``block_until_ready`` is not a completion barrier for
Pallas outputs on the axon relay.)

The running top-k fold uses k iterative max-extractions over the
[B, T + k] candidate block (k is small — 12 for MAP@12 retrieval); each
extraction is one VPU max-reduction + masked writeback, avoiding any
in-kernel sort. TPU grid steps execute sequentially, so the scratch
accumulates correctly across tiles.

Exclusion masking (train-item filtering at serving) composes by pre-masking
the item tile scores via the caller-provided fill value, same semantics as
``ops/topk.apply_exclusion``.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


def _fold_topk(vals, idx, scores, base, k):
    """Fold a [B, T] score tile into running ([B, k] vals, idx)."""
    b, t = scores.shape
    cand_vals = jnp.concatenate([vals, scores], axis=1)          # [B, k+T]
    tile_idx = jax.lax.broadcasted_iota(jnp.int32, (b, t), 1) + base
    cand_idx = jnp.concatenate([idx, tile_idx], axis=1)
    new_vals = []
    new_idx = []
    for _ in range(k):
        m = jnp.max(cand_vals, axis=1, keepdims=True)            # [B, 1]
        am = jnp.argmax(cand_vals, axis=1)                       # [B]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, cand_vals.shape, 1) == am[:, None]
        )
        # masked-max extraction instead of a gather (Mosaic-friendly;
        # candidate ids are non-negative)
        picked = jnp.max(jnp.where(onehot, cand_idx, -1), axis=1, keepdims=True)
        new_vals.append(m)
        new_idx.append(picked)
        cand_vals = jnp.where(onehot, NEG_INF, cand_vals)
    return (
        jnp.concatenate(new_vals, axis=1),
        jnp.concatenate(new_idx, axis=1),
    )


def _kernel(u_ref, it_ref, vals_ref, idx_ref, acc_vals, acc_idx, *, k, tile):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc_vals[:] = jnp.full_like(acc_vals, NEG_INF)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    scores = jax.lax.dot_general(
        u_ref[:], it_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, T]
    vals, idx = _fold_topk(acc_vals[:], acc_idx[:], scores, step * tile, k)
    acc_vals[:] = vals
    acc_idx[:] = idx

    @pl.when(step == nsteps - 1)
    def _():
        vals_ref[:] = acc_vals[:]
        idx_ref[:] = acc_idx[:]


def _kernel_masked(
    u_ref, it_ref, excl_ref, vals_ref, idx_ref, acc_vals, acc_idx, *, k, tile
):
    """Same fold, with a per-tile exclusion mask (1 = excluded)."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc_vals[:] = jnp.full_like(acc_vals, NEG_INF)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    scores = jax.lax.dot_general(
        u_ref[:], it_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    scores = jnp.where(excl_ref[:] != 0, NEG_INF, scores)
    vals, idx = _fold_topk(acc_vals[:], acc_idx[:], scores, step * tile, k)
    acc_vals[:] = vals
    acc_idx[:] = idx

    @pl.when(step == nsteps - 1)
    def _():
        vals_ref[:] = acc_vals[:]
        idx_ref[:] = acc_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def streaming_mips_topk(
    user_emb: jnp.ndarray,   # [B, D]
    item_emb: jnp.ndarray,   # [I, D], I divisible by tile
    k: int,
    tile: int = 512,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k inner-product items per user, streaming item tiles.

    Returns (values [B, k], item_ids [B, k]), identical to
    ``ops/topk.mips_topk`` (ties may order differently). ``interpret`` runs
    the Pallas interpreter (auto-on off-TPU, for CI on the CPU backend).
    """
    b, d = user_emb.shape
    i = item_emb.shape[0]
    assert i % tile == 0, (i, tile)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    grid = (i // tile,)
    vals, idx = pl.pallas_call(
        functools.partial(_kernel, k=k, tile=tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(user_emb.astype(jnp.float32), item_emb.astype(jnp.float32))
    return vals, idx


def row_quantize(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-row int8 quantization: returns (q int8 [N, D],
    scales f32 [1, N]) with x ≈ q · scalesᵀ. Scales are stored pre-
    transposed so kernel tiles broadcast over the score columns without an
    in-kernel relayout. Zero rows get scale 0 (dequantize to 0)."""
    absmax = jnp.max(jnp.abs(x), axis=1, keepdims=True)          # [N, 1]
    scale = absmax / 127.0
    q = jnp.where(
        scale > 0, jnp.round(x / jnp.maximum(scale, 1e-30)), 0.0
    ).astype(jnp.int8)
    return q, scale.reshape(1, -1)


def _kernel_int8(
    qu_ref, su_ref, qi_ref, si_ref, vals_ref, idx_ref, acc_vals, acc_idx,
    *, k, tile,
):
    """int8×int8 MXU score tile, dequantized by su·si before the fold."""
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc_vals[:] = jnp.full_like(acc_vals, NEG_INF)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    raw = jax.lax.dot_general(
        qu_ref[:], qi_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, T] int32
    scores = raw.astype(jnp.float32) * su_ref[:] * si_ref[:]
    vals, idx = _fold_topk(acc_vals[:], acc_idx[:], scores, step * tile, k)
    acc_vals[:] = vals
    acc_idx[:] = idx

    @pl.when(step == nsteps - 1)
    def _():
        vals_ref[:] = acc_vals[:]
        idx_ref[:] = acc_idx[:]


def _kernel_int8_masked(
    qu_ref, su_ref, qi_ref, si_ref, excl_ref, vals_ref, idx_ref,
    acc_vals, acc_idx, *, k, tile,
):
    step = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        acc_vals[:] = jnp.full_like(acc_vals, NEG_INF)
        acc_idx[:] = jnp.zeros_like(acc_idx)

    raw = jax.lax.dot_general(
        qu_ref[:], qi_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = raw.astype(jnp.float32) * su_ref[:] * si_ref[:]
    scores = jnp.where(excl_ref[:] != 0, NEG_INF, scores)
    vals, idx = _fold_topk(acc_vals[:], acc_idx[:], scores, step * tile, k)
    acc_vals[:] = vals
    acc_idx[:] = idx

    @pl.when(step == nsteps - 1)
    def _():
        vals_ref[:] = acc_vals[:]
        idx_ref[:] = acc_idx[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def streaming_mips_topk_int8(
    user_emb: jnp.ndarray,     # f32 [B, D]
    q_items: jnp.ndarray,      # int8 [I, D] (row_quantize)
    item_scales: jnp.ndarray,  # f32 [1, I]
    k: int,
    excl_mask: Optional[jnp.ndarray] = None,   # int8 [B, I] (1 = excluded)
    tile: int = 2048,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantized streaming retrieval: the item catalog lives and streams as
    int8 — 4× less HBM capacity than f32 — and at the 2048-row default tile
    it is also the FASTEST measured retrieval at serving shapes
    (BENCH_SERVING device_amortized, B=256/I=105k/D=64 amortized on-device:
    3.27 ms vs 3.83 f32-XLA-materializing and 8.4 at the old 512 tile — the
    per-tile top-k fold cost amortizes with tile width, so fewer, wider
    tiles win). Users are row-quantized on the fly; the dequantized score
    su·si·(qu·qi) approximates u·i to ~1% relative — an approximate-
    retrieval tradeoff the f32 kernels don't make (98% top-12 overlap at
    104k items; see test floors)."""
    b, d = user_emb.shape
    i = q_items.shape[0]
    assert i % tile == 0, (i, tile)
    assert item_scales.shape == (1, i)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    qu, su = row_quantize(user_emb)
    su_col = su.reshape(-1, 1)   # [B, 1] broadcast over score columns

    in_specs = [
        pl.BlockSpec((b, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((b, 1), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile), lambda s: (0, s), memory_space=pltpu.VMEM),
    ]
    args = [qu, su_col, q_items, item_scales]
    kernel = functools.partial(_kernel_int8, k=k, tile=tile)
    if excl_mask is not None:
        assert excl_mask.shape == (b, i)
        in_specs.append(
            pl.BlockSpec((b, tile), lambda s: (0, s), memory_space=pltpu.VMEM)
        )
        args.append(excl_mask)
        kernel = functools.partial(_kernel_int8_masked, k=k, tile=tile)

    vals, idx = pl.pallas_call(
        kernel,
        grid=(i // tile,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(*args)
    return vals, idx


def exclusion_mask(
    num_items: int,
    exclude_items: jnp.ndarray,
    exclude_count: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dense int8 [B, I] exclusion mask from padded per-user exclusion lists
    (one scatter; built once per eval batch, then streamed in tiles).
    Negative entries (the -1 pad convention) and slots beyond
    ``exclude_count`` are ignored."""
    b, x = exclude_items.shape
    valid = exclude_items >= 0
    if exclude_count is not None:
        valid &= jnp.arange(x)[None, :] < exclude_count[:, None]
    cols = jnp.where(valid, exclude_items, num_items)
    rows = jnp.broadcast_to(jnp.arange(b)[:, None], (b, x))
    mask = jnp.zeros((b, num_items), jnp.int8)
    return mask.at[rows, cols].set(1, mode="drop")


@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def streaming_mips_topk_masked(
    user_emb: jnp.ndarray,   # [B, D]
    item_emb: jnp.ndarray,   # [I, D]
    excl_mask: jnp.ndarray,  # int8 [B, I] (1 = excluded; see exclusion_mask)
    k: int,
    tile: int = 512,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Streaming top-k with exclusion masking — the serving/eval form
    (train-item filtering, ``utils/metrics_lightgcn.py:132-142`` semantics
    with -inf instead of the -2¹⁰ fill; identical top-k for real scores)."""
    b, d = user_emb.shape
    i = item_emb.shape[0]
    assert i % tile == 0 and excl_mask.shape == (b, i)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    vals, idx = pl.pallas_call(
        functools.partial(_kernel_masked, k=k, tile=tile),
        grid=(i // tile,),
        in_specs=[
            pl.BlockSpec((b, d), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile), lambda s: (0, s), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(
        user_emb.astype(jnp.float32),
        item_emb.astype(jnp.float32),
        excl_mask,
    )
    return vals, idx
