"""Blocked one-hot-matmul segment-sum — the fast sparse SpMM for big graphs.

``jax.ops.segment_sum`` lowers to a serialized scatter-add that measures
~12 GB/s effective on v5e-lite (SURVEY's core perf deliverable is exactly
this gather/scatter SpMM). This module reformulates the sorted-segment sum
so the reduction itself runs on the MXU:

1. **Host-side plan** (once per graph): walk the destination-sorted edges
   greedily, packing chunks of ≤ ``edges_per_chunk`` edges that touch
   ≤ ``rows_per_chunk`` distinct destination rows; pad each chunk (zero
   weight). Power-law graphs pack tightly in their high-degree regions and
   pay padding only in the degree-1 tail.
2. **Device**: messages are gathered in padded [C, E_c] layout; each chunk's
   one-hot row matrix (built from the precomputed local row ids with one
   broadcasted-iota compare) contracts against its messages on the MXU:
   ``partials[C, R_c, D] = onehot[C, R_c, E_c] @ msgs[C, E_c, D]``.
3. The residual scatter adds only ``C·R_c`` partial rows — a
   ``edges_per_chunk/rows_per_chunk``-fold reduction in scatter traffic.

Used by ``propagate_blocked`` as a drop-in for the two diffusion directions
of ``ops/spmm.propagate_bipartite``.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..data.graph import BipartiteGraph


@dataclass
class BlockedSegmentPlan:
    """Padded chunk layout for one (sorted-destination) edge direction."""

    src: jnp.ndarray        # int32 [C, E_c] gather ids (pad → 0)
    w: jnp.ndarray          # f32 [C, E_c] weights (pad → 0)
    local_row: jnp.ndarray  # int32 [C, E_c] dst row − chunk base (pad → 0)
    row_ids: jnp.ndarray    # int32 [C, R_c] global dst row per partial slot
    # int32 [num_rows] index of each row's LAST partial slot in the
    # flattened (row-sorted) partial layout, -1/previous for empty rows —
    # drives the sorted cumsum-diff combine (see ``blocked_segment_sum``).
    # None on plans that combine by scatter.
    ends: Optional[jnp.ndarray] = None
    # Windowed variant of the boundary gather: ``combine_idx[w, j]`` is the
    # (ends+1) boundary of the j-th row whose boundary falls in cumsum
    # window w, LOCAL to the window (pad → 0, sliced away by
    # ``combine_counts``). The XLA gather engine's big-table collapse (the
    # same one src-slicing works around) makes the plain [num_rows]-from-
    # [P+1] boundary gather cost 65 ms at H&M scale; gathering from
    # ≤COMBINE_WINDOW-row cumsum windows runs in the fast zone.
    combine_idx: Optional[jnp.ndarray] = None
    combine_counts: Tuple[int, ...] = dataclasses.field(
        metadata=dict(static=True), default=()
    )
    num_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    edges_per_chunk: int = dataclasses.field(metadata=dict(static=True), default=128)
    rows_per_chunk: int = dataclasses.field(metadata=dict(static=True), default=8)
    # src-slice partitioning (0 = off): edges are grouped by source-row
    # slice of width src_slice_rows; src ids are LOCAL to their slice and
    # the device loop gathers from a dynamic_slice of the table. The XLA
    # gather engine's rate collapses with table size (v5e, 128B rows:
    # 200M rows/s ≤131k rows → 40M rows/s at 1M rows); slicing the source
    # table recovers the fast zone (measured 194M rows/s via 16 slices of
    # the 1.37M-row H&M user table).
    src_slice_rows: int = dataclasses.field(metadata=dict(static=True), default=0)
    num_src_slices: int = dataclasses.field(metadata=dict(static=True), default=1)
    # Combine partials by sorted cumulative-sum + boundary difference
    # instead of scatter-add. XLA's TPU scatter runs ~7M rows/s into large
    # outputs (measured 290 ms for 2M partial rows → the 1.37M-row H&M user
    # table — 75% of the whole segsum); the sorted combine costs one cumsum
    # (13 ms) + one boundary gather (65 ms total), 4.4× faster. Requires the
    # flattened row_ids to be non-decreasing, so it is only set on UNSLICED
    # plans (src-sliced plans restart row order per slice — they combine by
    # the PER-SLICE sorted path below when ``slice_ends`` is present, else
    # by scatter).
    sorted_combine: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )
    # Per-slice sorted combine for src-sliced plans (small outputs): row
    # order restarts per slice, but WITHIN a slice the flattened row_ids
    # are non-decreasing, so each slice combines by cumsum + boundary
    # difference and the slice outputs sum. ``slice_ends[s, r]`` = index of
    # row r's LAST partial slot within slice s's flattened layout (-1 /
    # previous boundary when the slice holds no partial for r → zero diff).
    # NOT built by default (``build_slice_ends``): measured at H&M shape it
    # wins standalone (to_item 113→106 ms vs the 38 ms scatter) but LOSES
    # fused into the both-directions program (+150 ms — the [s_n, P_s, D]
    # batched cumsum materializes ~250 MB and its boundary gather reads
    # from 327k-row sources, past the gather fast zone; profile_hm r5c).
    # Kept for catalogs whose per-slice partial counts stay window-sized.
    slice_ends: Optional[jnp.ndarray] = None

    @staticmethod
    def _plan_np(
        dst_sorted: np.ndarray,
        src: np.ndarray,
        w: np.ndarray,
        num_rows: int,
        edges_per_chunk: int,
        rows_per_chunk: int,
        chunk_bucket: int,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Numpy core of the plan build → (src, w, local_row, row_ids).

        Kept numpy end-to-end: the jnp conversion happens ONCE in the public
        constructors (the earlier per-sub-plan device arrays forced device
        round-trips in the src-sliced stacker — minutes over a remote-device
        relay at H&M scale).

        Pad slots inside a chunk carry the chunk's LAST real row id (their
        partials are exactly zero — no edge maps to them — so they add
        nothing under either combine), keeping the flattened row_ids
        non-decreasing for the sorted combine; bucket pad chunks carry
        ``num_rows`` (> every real row, still sorted; zero partials).
        """
        dst_sorted = np.asarray(dst_sorted)
        src = np.asarray(src)
        w = np.asarray(w)
        e = len(dst_sorted)
        e_c, r_c = edges_per_chunk, rows_per_chunk
        if e == 0:
            return (
                np.zeros((1, e_c), np.int32),
                np.zeros((1, e_c), np.float32),
                np.zeros((1, e_c), np.int32),
                np.full((1, r_c), num_rows, np.int32),
            )
        # --- greedy chunking, vectorized (the per-chunk np.unique walk was
        # O(E·E_c) in Python — minutes at H&M's 28M edges; this build is
        # O(E) numpy + one O(#chunks) scalar chain) ---
        # runs of equal destination rows: rb[i] = first edge of run i
        change = np.flatnonzero(np.diff(dst_sorted)) + 1
        rb = np.concatenate([[0], change, [e]])          # [n_runs + 1]
        n_runs = len(rb) - 1
        run_len = np.diff(rb)
        run_of = np.repeat(np.arange(n_runs, dtype=np.int64), run_len)
        # cut rule (same as the original greedy): a chunk starting at edge s
        # ends at min(s + E_c, start of the (R_c+1)-th distinct row after s)
        cuts = [0]
        s = 0
        while s < e:
            end = min(
                s + e_c, int(rb[min(int(run_of[s]) + r_c, n_runs)]), e
            )
            cuts.append(end)
            s = end
        cuts = np.asarray(cuts, np.int64)
        c_real = len(cuts) - 1
        c = (
            -(-c_real // chunk_bucket) * chunk_bucket
            if chunk_bucket > 1
            else c_real
        )
        n_per_chunk = np.diff(cuts)
        chunk_of_edge = np.repeat(np.arange(c_real, dtype=np.int64), n_per_chunk)
        pos_in_chunk = np.arange(e, dtype=np.int64) - cuts[chunk_of_edge]

        p_src = np.zeros((c, e_c), np.int32)
        p_w = np.zeros((c, e_c), np.float32)
        p_local = np.zeros((c, e_c), np.int32)
        p_src[chunk_of_edge, pos_in_chunk] = src
        p_w[chunk_of_edge, pos_in_chunk] = w
        run_base = run_of[cuts[:-1]]                      # first run per chunk
        p_local[chunk_of_edge, pos_in_chunk] = (run_of - run_base[chunk_of_edge])
        # per-chunk distinct row ids; pad slots duplicate the chunk's last
        # real row (zero partials — see docstring), keeping flat order sorted
        n_dist = run_of[cuts[1:] - 1] - run_base + 1
        grid = run_base[:, None] + np.arange(r_c)[None, :]
        valid = np.arange(r_c)[None, :] < n_dist[:, None]
        run_vals = dst_sorted[rb[:-1]]                    # row value per run
        last_real = run_vals[run_base + n_dist - 1]       # [c_real]
        p_rows = np.full((c, r_c), num_rows, np.int32)    # bucket pads → no-op
        p_rows[:c_real] = np.where(
            valid, run_vals[np.minimum(grid, n_runs - 1)],
            last_real[:, None],
        ).astype(np.int32)
        return p_src, p_w, p_local, p_rows

    @staticmethod
    def from_edges(
        dst_sorted: np.ndarray,
        src: np.ndarray,
        w: np.ndarray,
        num_rows: int,
        edges_per_chunk: int = 128,
        rows_per_chunk: int = 8,
        chunk_bucket: int = 1024,
        sorted_combine: bool = False,
    ) -> "BlockedSegmentPlan":
        """``chunk_bucket`` rounds the chunk count up with no-op pad chunks
        (w=0, zero partials) so similar-sized graphs land on the SAME array
        shapes — one compiled executable serves e.g. both eval splits
        instead of one multi-minute remote compile each at H&M scale.
        Overhead ≤ bucket-1 no-op chunks (~0.5% of the 218k-chunk H&M train
        plan). ``sorted_combine`` builds the boundary index for the
        cumsum-diff combine (see the field doc)."""
        p_src, p_w, p_local, p_rows = BlockedSegmentPlan._plan_np(
            dst_sorted, src, w, num_rows, edges_per_chunk, rows_per_chunk,
            chunk_bucket,
        )
        ends = None
        combine_idx = None
        combine_counts: Tuple[int, ...] = ()
        if sorted_combine:
            flat = p_rows.reshape(-1)
            e1 = np.searchsorted(flat, np.arange(num_rows), side="right").astype(
                np.int64
            )  # = ends + 1, in [0, P]
            ends = jnp.asarray((e1 - 1).astype(np.int32))
            p1 = flat.shape[0] + 1
            if p1 > COMBINE_WINDOW:
                # windowed boundary gather (see the field doc): rows are
                # sorted by boundary, so each cumsum window owns a
                # contiguous row range
                w_cnt = -(-p1 // COMBINE_WINDOW)
                bounds = np.searchsorted(
                    e1, np.arange(w_cnt + 1) * COMBINE_WINDOW
                )
                counts = np.diff(bounds)
                r_max = int(max(counts.max(), 1))
                idx = np.zeros((w_cnt, r_max), np.int32)
                for wi in range(w_cnt):
                    c_w = counts[wi]
                    idx[wi, :c_w] = (
                        e1[bounds[wi]:bounds[wi + 1]] - wi * COMBINE_WINDOW
                    )
                combine_idx = jnp.asarray(idx)
                combine_counts = tuple(int(c) for c in counts)
        return BlockedSegmentPlan(
            src=jnp.asarray(p_src),
            w=jnp.asarray(p_w),
            local_row=jnp.asarray(p_local),
            row_ids=jnp.asarray(p_rows),
            ends=ends,
            combine_idx=combine_idx,
            combine_counts=combine_counts,
            num_rows=num_rows,
            edges_per_chunk=edges_per_chunk,
            rows_per_chunk=rows_per_chunk,
            sorted_combine=sorted_combine,
        )

    @staticmethod
    def from_edges_src_sliced(
        dst_sorted: np.ndarray,
        src: np.ndarray,
        w: np.ndarray,
        num_rows: int,
        num_src_rows: int,
        edges_per_chunk: int = 128,
        rows_per_chunk: int = 8,
        chunk_bucket: int = 1024,
        slice_rows: int = 131072,
        sorted_combine: bool = False,
        build_slice_ends: bool = False,
    ) -> "BlockedSegmentPlan":
        """Partition the edges by SOURCE-row slice so the device gathers
        from ≤``slice_rows``-row table windows — the fast zone of the XLA
        gather engine (see the field comment). Width caveat (SLICE_SWEEP.json
        + profile_hm r5b–r5d at H&M shape, bf16 64B rows): STANDALONE the
        knee is 262144 rows (100.8 ms vs 113.3 at 131072; 65536 → 158 ms,
        524288 → 263, unsliced → 358) — but FUSED into the two-direction
        propagation program the 262144 plan regresses hard (both-dirs
        236 → 382 ms; the larger 33.5 MB scan windows break XLA's overlap
        of the two directions), so the default stays 131072: the
        composition that production actually runs is what's optimized. Within each slice the
        dst-sorted order is preserved (stable filtering of a sorted list),
        so the per-slice chunking is the ordinary plan; all slices pad to
        one chunk count and stack. Sliced plans always combine by scatter
        (row order restarts per slice), so ``sorted_combine`` only applies
        to the single-slice fallback."""
        s_count = -(-max(num_src_rows, 1) // slice_rows)
        if s_count <= 1:
            return BlockedSegmentPlan.from_edges(
                dst_sorted, src, w, num_rows, edges_per_chunk,
                rows_per_chunk, chunk_bucket, sorted_combine=sorted_combine,
            )
        if sorted_combine:
            # Both sides large (≥2^19 dst rows AND >2^18 src rows): the
            # combine falls back to scatter because row order restarts per
            # src slice. On such graphs the scatter into the big dst table
            # is the measured binding cost (~290 ms/1.37M rows vs 65 ms
            # sorted) — a per-slice cumsum-diff combine is the known fix if
            # this shape becomes a production path. H&M's directions are
            # asymmetric, so neither hits this.
            import warnings

            warnings.warn(
                f"src-sliced plan with a large ({num_rows}-row) output "
                "combines by scatter, not sorted cumsum-diff; expect the "
                "segment-sum to be scatter-bound at this shape",
                stacklevel=3,
            )
        src = np.asarray(src)
        dst_sorted = np.asarray(dst_sorted)
        w = np.asarray(w)
        # one stable sort groups edges by slice while preserving the
        # dst-sorted order inside each slice (S masking passes over the
        # whole edge list cost ~1 min at H&M scale)
        slice_of = src // slice_rows
        order = np.argsort(slice_of, kind="stable")
        src_o, dst_o, w_o = src[order], dst_sorted[order], w[order]
        bounds = np.searchsorted(
            slice_of[order], np.arange(s_count + 1) * 1
        )
        plans = []
        for si in range(s_count):
            sl = slice(bounds[si], bounds[si + 1])
            plans.append(
                BlockedSegmentPlan._plan_np(
                    dst_o[sl], src_o[sl] - si * slice_rows, w_o[sl], num_rows,
                    edges_per_chunk, rows_per_chunk, chunk_bucket,
                )
            )
        cmax = max(p[0].shape[0] for p in plans)
        # keep the per-scan-step chunk count ≤ MAX_CHUNKS_PER_SLICE: the
        # device path sub-splits each src-slice into k2 scan steps, so cmax
        # must divide evenly into k2 blocks (no-op pads make up the rest)
        k2 = -(-cmax // MAX_CHUNKS_PER_SLICE)
        cmax = -(-cmax // k2) * k2

        def pad_stack(i, fill):
            return np.concatenate(
                [
                    np.pad(
                        p[i],
                        ((0, cmax - p[i].shape[0]), (0, 0)),
                        constant_values=fill,
                    )
                    for p in plans
                ]
            )

        rows_stacked = pad_stack(3, num_rows)
        slice_ends = None
        if build_slice_ends and num_rows <= BlockedGraph.SRC_SLICE_THRESHOLD:
            # per-slice boundary index for the sorted combine (see field
            # doc): within each slice the flattened row_ids are
            # non-decreasing (pad chunks carry num_rows, sorted last)
            flat_per_slice = rows_stacked.reshape(
                s_count, cmax * rows_per_chunk
            )
            e1 = np.stack([
                np.searchsorted(flat_per_slice[s], np.arange(num_rows),
                                side="right")
                for s in range(s_count)
            ])  # [s_n, num_rows], values in [0, P_s]
            slice_ends = jnp.asarray((e1 - 1).astype(np.int32))

        return BlockedSegmentPlan(
            src=jnp.asarray(pad_stack(0, 0)),
            w=jnp.asarray(pad_stack(1, 0.0)),
            local_row=jnp.asarray(pad_stack(2, 0)),
            row_ids=jnp.asarray(rows_stacked),
            num_rows=num_rows,
            edges_per_chunk=edges_per_chunk,
            rows_per_chunk=rows_per_chunk,
            src_slice_rows=slice_rows,
            num_src_slices=s_count,
            slice_ends=slice_ends,
        )


jax.tree_util.register_dataclass(BlockedSegmentPlan)


# Max chunks contracted in one XLA op. Beyond this the op runs as a lax.scan
# over equal slices: the [slice, E_c, D] message block stays ≤ ~270 MB
# (f32, D=32) no matter the graph size — and, critically, no matter what
# layout XLA picks for the gather (its flattened-gather strategy lane-pads
# D=32 to 128, a 4× expansion that turned the one-op message block into
# 12 GB at H&M scale). ML-1M-scale graphs (~8k chunks) stay single-op.
MAX_CHUNKS_PER_SLICE = 16384


def _blocked_partial_contract(src, w, local_row, table, r_c, e_c, precision):
    """messages → per-chunk partial rows: [C_s, R_c, D].

    With a bf16 table (the ``gather_bf16`` mode) the message block and the
    one-hot stay bf16 and the contraction runs MXU-native with f32
    accumulation — half the gather/onehot bytes on top of the already-
    approximate bf16 rows. f32 tables keep the exact HIGHEST-precision
    contraction."""
    if table.dtype == jnp.bfloat16:
        msgs = w[..., None].astype(jnp.bfloat16) * table[src]   # [C_s, E_c, D]
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (1, r_c, e_c), 1)
            == local_row[:, None, :]
        ).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            onehot, msgs,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    msgs = w[..., None] * table[src].astype(jnp.float32)        # [C_s, E_c, D]
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (1, r_c, e_c), 1)
        == local_row[:, None, :]
    ).astype(jnp.float32)                                       # [C_s, R_c, E_c]
    return jax.lax.dot_general(
        onehot, msgs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=precision,
    )


# Cumsum-window width for the sorted combine's boundary gather — the XLA
# gather fast zone (matches the src-slice width rationale).
COMBINE_WINDOW = 131072


def _combine_sorted(plan: BlockedSegmentPlan, flat: jnp.ndarray) -> jnp.ndarray:
    """Row-sorted partials → output rows by cumulative sum + boundary
    difference (no scatter; see ``BlockedSegmentPlan.sorted_combine``).

    Numerics: out[r] = S[end_r] − S[end_{r−1}] — the cumsum's accumulated
    rounding drift cancels in the difference; the residual is the f32
    representation granularity at the cumsum's magnitude (~1e-5 relative at
    H&M scale, measured 6e-6 max vs scatter), below the bf16 gather noise
    the big-table mode already carries.

    The boundary gather runs windowed when the plan carries ``combine_idx``
    (rows are boundary-sorted, so each ≤COMBINE_WINDOW-row cumsum window
    serves a contiguous row range at the gather engine's fast-zone rate).
    """
    d = flat.shape[-1]
    s = jnp.cumsum(flat.astype(jnp.float32), axis=0)
    z = jnp.zeros((1, d), jnp.float32)
    s0 = jnp.concatenate([z, s], axis=0)                   # [P+1, D]
    if plan.combine_idx is not None:
        w_cnt = plan.combine_idx.shape[0]
        total = w_cnt * COMBINE_WINDOW
        # runtime scan padding can make s0 longer than the bucketed length
        # the windows were built for — every boundary is < the bucketed
        # P+1, so truncating to the window span is safe
        s0p = (
            s0[:total]
            if s0.shape[0] >= total
            else jnp.pad(s0, ((0, total - s0.shape[0]), (0, 0)))
        )
        offs = jnp.arange(w_cnt, dtype=jnp.int32) * COMBINE_WINDOW

        def body(carry, xs):
            idx_w, off = xs
            win = jax.lax.dynamic_slice(s0p, (off, 0), (COMBINE_WINDOW, d))
            return carry, win[idx_w]

        _, gw = jax.lax.scan(body, 0, (plan.combine_idx, offs))
        g = jnp.concatenate(
            [gw[wi, : plan.combine_counts[wi]] for wi in range(w_cnt)]
        )                                                   # [num_rows, D]
    else:
        g = s0[plan.ends + 1]                               # [num_rows, D]
    return g - jnp.concatenate([z, g[:-1]], axis=0)


def blocked_segment_sum(
    plan: BlockedSegmentPlan,
    table: jnp.ndarray,
    precision="highest",
    gather_bf16: bool = False,
) -> jnp.ndarray:
    """Σ_{e: dst(e)=r} w_e · table[src(e)] for every row r — [num_rows, D].

    Default precision HIGHEST keeps the sums f32-exact (measured 2.9e-7 max
    relative error vs segment_sum at ML-1M scale) at no measurable cost over
    the bf16 default (5.45 ms vs 5.38 ms) — the contraction is gather-bound,
    not MXU-bound.

    ``gather_bf16`` casts the source table to bf16 BEFORE the per-edge
    gather (weights and accumulation stay f32). The gather is the binding
    resource and its rate collapses on large tables (measured on v5e:
    39M rows/s from a 176 MB f32 table vs 75M rows/s from the same table in
    bf16; small tables run ~190-270M rows/s either way) — so halving row
    bytes ≈ doubles the big-table direction. Costs one stream-rate cast per
    call and ~3-digit message precision (comparable to the dense path's
    bf16 adjacency).
    """
    if gather_bf16 and table.dtype == jnp.float32:
        table = table.astype(jnp.bfloat16)
    c = plan.src.shape[0]
    r_c, e_c = plan.rows_per_chunk, plan.edges_per_chunk
    d = table.shape[-1]

    if plan.num_src_slices > 1:
        # src-sliced path: scan over source-table windows; each slice's
        # gather hits the engine's fast zone (194M vs 39M rows/s measured
        # on the 1.37M-row H&M user table). Slices with more than
        # MAX_CHUNKS_PER_SLICE chunks sub-split into k2 scan steps sharing
        # one window offset, so the per-step message block stays bounded
        # (the plan builder rounds the chunk count to divide evenly).
        s_n, rps = plan.num_src_slices, plan.src_slice_rows
        cs = c // s_n
        k2 = -(-cs // MAX_CHUNKS_PER_SLICE)
        steps = s_n * k2
        cs2 = cs // k2
        pad_rows = s_n * rps - table.shape[0]
        tab = jnp.pad(table, ((0, pad_rows), (0, 0)))
        src3 = plan.src.reshape(steps, cs2, e_c)
        w3 = plan.w.reshape(steps, cs2, e_c)
        loc3 = plan.local_row.reshape(steps, cs2, e_c)
        offs = jnp.repeat(jnp.arange(s_n, dtype=jnp.int32) * rps, k2)

        def body(carry, xs):
            s_ids, w_s, loc_s, off = xs
            window = jax.lax.dynamic_slice(tab, (off, 0), (rps, d))
            return carry, _blocked_partial_contract(
                s_ids, w_s, loc_s, window, r_c, e_c, precision
            )

        _, partials = jax.lax.scan(body, 0, (src3, w3, loc3, offs))
        if plan.slice_ends is not None:
            # per-slice sorted combine (see the slice_ends field doc):
            # each slice's flattened partials are row-sorted, so
            # out[r] = Σ_s (S_s[end_{s,r}+1] − S_s[end_{s,r'}+1]) with S_s
            # the slice cumsum — no scatter. The boundary diff telescopes
            # per slice exactly like _combine_sorted.
            part = partials.reshape(s_n, cs * r_c, d)
            s_cum = jnp.cumsum(part.astype(jnp.float32), axis=1)
            z = jnp.zeros((s_n, 1, d), jnp.float32)
            s0 = jnp.concatenate([z, s_cum], axis=1)       # [s_n, P_s+1, D]
            g = jnp.take_along_axis(
                s0, (plan.slice_ends + 1)[..., None].astype(jnp.int32), axis=1
            )                                              # [s_n, R, D]
            gprev = jnp.concatenate([z, g[:, :-1]], axis=1)
            return jnp.sum(g - gprev, axis=0)
        out = jnp.zeros((plan.num_rows, d), jnp.float32)
        return out.at[plan.row_ids.reshape(-1)].add(
            partials.reshape(-1, d), mode="drop"
        )

    if c <= MAX_CHUNKS_PER_SLICE:
        partials = _blocked_partial_contract(
            plan.src, plan.w, plan.local_row, table, r_c, e_c, precision
        )
        if plan.sorted_combine:
            return _combine_sorted(plan, partials.reshape(-1, d))
        out = jnp.zeros((plan.num_rows, d), partials.dtype)
        return out.at[plan.row_ids.reshape(-1)].add(
            partials.reshape(-1, d), mode="drop"
        )

    # big-graph path: scan over bounded chunk slices EMITTING partials, one
    # scatter at the end (pad chunks carry w=0 and row_ids=num_rows →
    # no-ops). Carrying the [num_rows, D] table through the scan instead
    # would read-modify-write it once per slice — ~4.7 GB of carry traffic
    # per segment-sum at H&M scale, 5× the actual message traffic.
    s = MAX_CHUNKS_PER_SLICE
    g = -(-c // s)
    pad = g * s - c
    src = jnp.pad(plan.src, ((0, pad), (0, 0))).reshape(g, s, e_c)
    w = jnp.pad(plan.w, ((0, pad), (0, 0))).reshape(g, s, e_c)
    local = jnp.pad(plan.local_row, ((0, pad), (0, 0))).reshape(g, s, e_c)

    def body(carry, xs):
        src_s, w_s, local_s = xs
        return carry, _blocked_partial_contract(
            src_s, w_s, local_s, table, r_c, e_c, precision
        )

    _, partials = jax.lax.scan(body, 0, (src, w, local))   # [g, s, R_c, D]
    if plan.sorted_combine:
        # runtime pad chunks append AFTER the bucketed plan with zero
        # partials; `ends` never points past the bucketed length, so the
        # tail is inert under the sorted combine too
        return _combine_sorted(plan, partials.reshape(-1, d))
    flat_rows = jnp.pad(
        plan.row_ids, ((0, pad), (0, 0)), constant_values=plan.num_rows
    ).reshape(-1)
    out = jnp.zeros((plan.num_rows, d), jnp.float32)
    return out.at[flat_rows].add(partials.reshape(-1, d), mode="drop")


@dataclass
class BlockedGraph:
    """Both diffusion directions as blocked plans.

    ``gather_bf16`` (static) switches both directions' table gathers to
    bf16 — set by ``select_propagation`` for graphs whose node tables are
    large enough that the gather rate collapses (see
    ``blocked_segment_sum``)."""

    to_user: BlockedSegmentPlan   # dst=user, src=item
    to_item: BlockedSegmentPlan   # dst=item, src=user
    gather_bf16: bool = dataclasses.field(
        metadata=dict(static=True), default=False
    )

    # Source tables past this row count gather in src-slices (the XLA
    # gather engine's rate collapses with table size; see the plan field).
    SRC_SLICE_THRESHOLD = 1 << 18
    # Output tables at/above this row count combine by sorted cumsum-diff
    # instead of scatter (XLA's scatter rate into big outputs is the
    # binding cost — 290 ms vs 65 ms at the 1.37M-row H&M user table).
    SORTED_COMBINE_MIN_ROWS = 1 << 19

    @staticmethod
    def _direction_plan(
        dst_sorted, src, w, num_rows, num_src_rows, e_c, r_c
    ) -> BlockedSegmentPlan:
        if r_c is None:
            # R_c=8 keeps chunks densely packed across degree distributions:
            # a mean-degree-derived R_c=2 on the H&M item direction cut the
            # partial count 5× but ballooned the chunk count 2.26× (the
            # power-law TAIL's low-degree rows stop packing) — gather work
            # dominates, so fill wins over partial count
            r_c = 8
        sort_comb = num_rows >= BlockedGraph.SORTED_COMBINE_MIN_ROWS
        if num_src_rows > BlockedGraph.SRC_SLICE_THRESHOLD:
            return BlockedSegmentPlan.from_edges_src_sliced(
                dst_sorted, src, w, num_rows, num_src_rows, e_c, r_c,
                sorted_combine=sort_comb,
            )
        return BlockedSegmentPlan.from_edges(
            dst_sorted, src, w, num_rows, e_c, r_c,
            sorted_combine=sort_comb,
        )

    @staticmethod
    def from_graph(
        g: BipartiteGraph, edges_per_chunk: int = 128,
        rows_per_chunk: Optional[int] = None,
    ) -> "BlockedGraph":
        eu, ei, w, eu_im, ei_im, w_im = g.host_arrays()
        return BlockedGraph(
            # to_user gathers ITEM rows; to_item gathers USER rows
            to_user=BlockedGraph._direction_plan(
                eu, ei, w, g.num_users, g.num_items,
                edges_per_chunk, rows_per_chunk,
            ),
            to_item=BlockedGraph._direction_plan(
                ei_im, eu_im, w_im, g.num_items, g.num_users,
                edges_per_chunk, rows_per_chunk,
            ),
        )

    @staticmethod
    def from_host_edges(
        user_idx: np.ndarray,
        item_idx: np.ndarray,
        num_users: int,
        num_items: int,
        edges_per_chunk: int = 128,
        rows_per_chunk: Optional[int] = None,
    ) -> "BlockedGraph":
        """Build directly from host edge arrays (no device round trip —
        ``from_graph`` has to download the edge arrays first, which is slow
        over remote-device tunnels)."""
        user_idx = np.asarray(user_idx, np.int64)
        item_idx = np.asarray(item_idx, np.int64)
        du = np.bincount(user_idx, minlength=num_users)
        di = np.bincount(item_idx, minlength=num_items)
        w = 1.0 / np.sqrt(
            np.maximum(du[user_idx] * di[item_idx], 1.0)
        )
        um = np.lexsort((item_idx, user_idx))
        im = np.lexsort((user_idx, item_idx))
        return BlockedGraph(
            to_user=BlockedGraph._direction_plan(
                user_idx[um], item_idx[um], w[um], num_users, num_items,
                edges_per_chunk, rows_per_chunk,
            ),
            to_item=BlockedGraph._direction_plan(
                item_idx[im], user_idx[im], w[im], num_items, num_users,
                edges_per_chunk, rows_per_chunk,
            ),
        )


jax.tree_util.register_dataclass(BlockedGraph)


@jax.custom_vjp
def propagate_blocked(
    bg: BlockedGraph,
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for ``spmm.propagate_bipartite`` on the blocked layout
    (measured 3.6× faster at ML-1M scale: 5.4 ms vs 19.4 ms both dirs).

    Custom VJP: with à the symmetric-normalized adjacency, the forward is
    (Ã·i, Ãᵀ·u) and the cotangent pullback is (Ã·gᵢ, Ãᵀ·gᵤ) — the SAME
    operator on the cotangents, and both plans are already in ``bg``. This
    matters beyond elegance: XLA's automatic transpose of the blocked
    dot_general materializes the [C, E_c, D] message cotangent in a
    lane-padded layout (4× expansion — a 12 GB buffer at H&M scale, instant
    OOM); routing the backward through the forward kernel keeps the layout
    optimal and the peak at one message block."""
    return (
        blocked_segment_sum(bg.to_user, item_emb, gather_bf16=bg.gather_bf16),
        blocked_segment_sum(bg.to_item, user_emb, gather_bf16=bg.gather_bf16),
    )


def _propagate_blocked_fwd(bg, user_emb, item_emb):
    return propagate_blocked(bg, user_emb, item_emb), bg


def _propagate_blocked_bwd(bg, cts):
    g_u, g_i = cts
    grad_user = blocked_segment_sum(bg.to_user, g_i, gather_bf16=bg.gather_bf16)
    grad_item = blocked_segment_sum(bg.to_item, g_u, gather_bf16=bg.gather_bf16)
    # the plan itself is data, not a trainable: its cotangent is dropped by
    # the caller, so hand back zeros (float0 for the integer leaves) — XLA
    # dead-code-eliminates them
    import jax.dtypes

    def _zero(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    return jax.tree.map(_zero, bg), grad_user, grad_item


propagate_blocked.defvjp(_propagate_blocked_fwd, _propagate_blocked_bwd)


def lightgcn_propagate_blocked(
    bg: BlockedGraph,
    user_emb0: jnp.ndarray,
    item_emb0: jnp.ndarray,
    num_iterations: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-iteration multi-scale mean on the blocked layout (same contract as
    ``spmm.lightgcn_propagate``).

    The whole loop carries ONE self-adjoint custom VJP
    (``ops/multiscale.py``): backward = the identical K-loop on the
    cotangents — no per-iteration cotangent chains, no residuals (the
    operator is linear), so the live set is one [C, E_c, D] message block
    regardless of K — the property that lets H&M-scale training fit a
    16 GB chip."""
    from .multiscale import self_adjoint_multiscale

    return self_adjoint_multiscale(
        propagate_blocked, bg, user_emb0, item_emb0, num_iterations
    )
